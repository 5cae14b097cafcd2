"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule on
the virtual mesh must reproduce the sequential block stack exactly —
forward bit-identical, gradients to f32 reduction noise — standalone
on a ('stage',) mesh and composed with data parallelism on a 2-D
('data', 'stage') mesh, and a full SGD step must match the
single-device step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnsn_tpu.parallel import make_mesh
from cnsn_tpu.parallel.pipeline import (PipelineParallel,
                                        init_selfnorm_block,
                                        pipeline_apply, selfnorm_block,
                                        stack_layer_params)

L, C, B, M = 8, 16, 8, 4  # layers, channels, batch, microbatches


@pytest.fixture(scope="module")
def blocks():
    keys = jax.random.split(jax.random.key(0), L)
    return stack_layer_params([init_selfnorm_block(k, C) for k in keys])


@pytest.fixture(scope="module")
def x():
    rng = np.random.RandomState(1)
    return jnp.asarray(rng.randn(B, 8, 8, C).astype(np.float32))


def seq_apply(blocks, x):
    h, _ = jax.lax.scan(lambda c, p: (selfnorm_block(p, c), None),
                        x, blocks)
    return h


def test_forward_matches_sequential(blocks, x):
    ref = jax.jit(seq_apply)(blocks, x)
    mesh = make_mesh(4, ("stage",))
    pp = PipelineParallel(mesh)
    out = jax.jit(lambda b, xx: pipeline_apply(
        selfnorm_block, b, xx, mesh, M))(
            pp.shard_blocks(blocks), pp.replicate(x))
    # identical math, just rescheduled: bit-exact
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_grads_match_sequential(blocks, x):
    mesh = make_mesh(4, ("stage",))
    pp = PipelineParallel(mesh)

    def loss_pipe(b, xx):
        return jnp.mean(pipeline_apply(selfnorm_block, b, xx, mesh, M) ** 2)

    def loss_seq(b, xx):
        return jnp.mean(seq_apply(b, xx) ** 2)

    gp, gxp = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(
        pp.shard_blocks(blocks), pp.replicate(x))
    gs, gxs = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(blocks, x)
    # backward reduction order differs (reverse-ring ppermute): f32 noise
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5 * float(
                                       jnp.abs(b).max()))
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxs),
                               rtol=0,
                               atol=1e-5 * float(jnp.abs(gxs).max()))


def test_composes_with_data_parallel(blocks, x):
    ref = jax.jit(seq_apply)(blocks, x)
    mesh = make_mesh(8, ("data", "stage"), (2, 4))
    pp = PipelineParallel(mesh, data_axis="data")
    out = jax.jit(lambda b, xx: pipeline_apply(
        selfnorm_block, b, xx, mesh, M, data_axis="data"))(
            pp.shard_blocks(blocks), pp.shard_batch(x))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sgd_step_matches_sequential(blocks, x):
    """One full train step (trunk pipelined, CE head outside the
    shard_map) lands on the same params as the single-device step."""
    mesh = make_mesh(8, ("data", "stage"), (2, 4))
    pp = PipelineParallel(mesh, data_axis="data")
    labels = jnp.asarray(np.random.RandomState(2).randint(0, 5, B))
    wk = jax.random.normal(jax.random.key(3), (C, 5)) * 0.1
    lr = 0.1

    def head_loss(h, w, y):
        logits = jnp.mean(h, axis=(1, 2)) @ w
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))

    def step(loss_fn, params, *args):
        g = jax.grad(loss_fn)(params, *args)
        return jax.tree.map(lambda p, gg: p - lr * gg, params, g)

    def loss_pipe(params, xx, y):
        h = pipeline_apply(selfnorm_block, params["blocks"], xx, mesh, M,
                           data_axis="data")
        return head_loss(h, params["head"], y)

    def loss_seq(params, xx, y):
        return head_loss(seq_apply(params["blocks"], xx), params["head"], y)

    p_pipe = {"blocks": pp.shard_blocks(blocks), "head": pp.replicate(wk)}
    p_seq = {"blocks": blocks, "head": wk}
    new_pipe = jax.jit(lambda p, xx, y: step(loss_pipe, p, xx, y))(
        p_pipe, pp.shard_batch(x), pp.shard_batch(labels))
    new_seq = jax.jit(lambda p, xx, y: step(loss_seq, p, xx, y))(
        p_seq, x, labels)
    for a, b in zip(jax.tree.leaves(new_pipe), jax.tree.leaves(new_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6 * max(
                                       float(jnp.abs(b).max()), 1.0))


def test_layer_count_must_divide_stages(blocks, x):
    mesh = make_mesh(4, ("stage",))
    bad = jax.tree.map(lambda p: p[:6], blocks)  # 6 layers on 4 stages
    with pytest.raises(ValueError, match="divide"):
        pipeline_apply(selfnorm_block, bad, x, mesh, M)


def test_batch_must_divide_microbatches(blocks, x):
    mesh = make_mesh(4, ("stage",))
    with pytest.raises(ValueError, match="divisible"):
        pipeline_apply(selfnorm_block, blocks, x[:6], mesh, M)


def test_microbatch_must_divide_data_axis(blocks, x):
    """An invalid (microbatch size, data-axis extent) combination must
    fail with a clear ValueError, not an opaque shard_map error."""
    mesh = make_mesh(8, ("data", "stage"), (2, 4))
    # B=8, M=8 → microbatch size 1, not divisible by data axis of 2
    with pytest.raises(ValueError, match="mesh axis 'data'"):
        pipeline_apply(selfnorm_block, blocks, x, mesh, 8,
                       data_axis="data")


class TestResNetPipeline:
    """Heterogeneous-stage GPipe on the REAL flagship model: the
    pipelined eval/serving forward must equal the sequential
    model.apply exactly (BN frozen + CrossNorm inactive + per-sample
    SelfNorm ⇒ every stage is microbatch-invariant)."""

    @pytest.fixture(scope="class")
    def model_and_vars(self):
        from cnsn_tpu.models import build_model
        model = build_model("resnet50", num_classes=12, pos="residual",
                            cnsn_type="cnsn", crop="neither", beta=1.0)
        x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x0, False,
                               None)
        return model, variables

    def test_stage_chain_matches_model(self, model_and_vars):
        """ResNetStage slices chained sequentially reproduce the
        monolithic forward bit-exactly (same submodule names/params)."""
        from cnsn_tpu.parallel import resnet_stage_fns
        model, variables = model_and_vars
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
        ref = model.apply(variables, x, False, None)
        h = x
        for f in resnet_stage_fns(model, 4):
            h = f(variables, h)
        np.testing.assert_array_equal(np.asarray(h), np.asarray(ref))

    def test_pipelined_serving_forward_matches_sequential(
            self, model_and_vars):
        from cnsn_tpu.parallel import pipeline_stages, resnet_stage_fns
        model, variables = model_and_vars
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
        ref = jax.jit(lambda v, xx: model.apply(v, xx, False, None))(
            variables, x)
        mesh = make_mesh(4, ("stage",))
        fns = resnet_stage_fns(model, 4)
        out = jax.jit(lambda v, xx: pipeline_stages(fns, v, xx, mesh, 4))(
            variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    def test_pipelined_composes_with_data_parallel(self, model_and_vars):
        from cnsn_tpu.parallel import pipeline_stages, resnet_stage_fns
        model, variables = model_and_vars
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
        ref = jax.jit(lambda v, xx: model.apply(v, xx, False, None))(
            variables, x)
        mesh = make_mesh(8, ("data", "stage"), (2, 4))
        fns = resnet_stage_fns(model, 4)
        out = jax.jit(lambda v, xx: pipeline_stages(
            fns, v, xx, mesh, 4, data_axis="data"))(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    def test_stage_fns_reject_non_resnet(self):
        """Families without a staged apply get a clear error, not an
        AttributeError from from_model (IBN lacks groups/width)."""
        from cnsn_tpu.models import build_model
        from cnsn_tpu.parallel import resnet_stage_fns
        model = build_model("resnet50_ibn_b", num_classes=12)
        with pytest.raises(ValueError, match="ResNet"):
            resnet_stage_fns(model, 4)

    def test_stage_fn_count_must_match_mesh(self, model_and_vars):
        from cnsn_tpu.parallel import pipeline_stages, resnet_stage_fns
        model, variables = model_and_vars
        mesh = make_mesh(4, ("stage",))
        fns = resnet_stage_fns(model, 2)
        with pytest.raises(ValueError, match="stage fns"):
            pipeline_stages(fns, variables,
                            jnp.zeros((8, 32, 32, 3)), mesh, 4)
