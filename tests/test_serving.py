"""Serving artifacts (cnsn_tpu/serving.py): StableHLO export with a
symbolic batch dim, weights baked in, roundtrip through one file, and
calls WITHOUT the model's Python code.  No reference counterpart (its
eval needs the full torch model, cifar.py:280-312)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cnsn_tpu.models import build_model
from cnsn_tpu.serving import (export_classifier, export_segmenter,
                              load_artifact, save_artifact)


@pytest.fixture(scope="module")
def allconv():
    model = build_model("allconv", num_classes=10, pos="1",
                        cnsn_type="cnsn", crop="neither", beta=1.0)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x0, False, None)
    return model, variables


def test_export_classifier_symbolic_batch(allconv):
    """One artifact serves multiple batch sizes, logits exactly equal
    the in-framework eval forward."""
    model, variables = allconv
    exported = export_classifier(model, variables, image_size=32)
    for b in (4, 12):
        x = jnp.asarray(np.random.RandomState(b).randn(b, 32, 32, 3)
                        .astype(np.float32))
        want = model.apply(variables, x, False, None)
        got = exported.call(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_multi_platform_artifact(allconv):
    """One artifact lowered for both tpu and cpu (cross-platform
    lowering): serves on whichever backend loads it."""
    model, variables = allconv
    exported = export_classifier(model, variables, image_size=32,
                                 platforms=("tpu", "cpu"))
    assert exported.platforms == ("tpu", "cpu")
    y = exported.call(jnp.zeros((2, 32, 32, 3)))
    assert y.shape == (2, 10)


def test_artifact_roundtrip_without_model_code(allconv, tmp_path):
    """save → load → call: the loaded callable is pure StableHLO, no
    Flax module or params needed on the serving side."""
    model, variables = allconv
    p = str(tmp_path / "allconv.shlo")
    save_artifact(export_classifier(model, variables, image_size=32), p)
    serve = load_artifact(p)
    x = jnp.asarray(np.random.RandomState(0).randn(6, 32, 32, 3)
                    .astype(np.float32))
    want = model.apply(variables, x, False, None)
    np.testing.assert_allclose(np.asarray(serve(x)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_export_segmenter(tmp_path):
    from cnsn_tpu.segmentation import fcn_cnsn
    model = fcn_cnsn(classes=5, block_idxs="1", pos="residual",
                     cn_pos=None, cnsn_type="sn", crop="neither",
                     dropout=0.0)
    x0 = jnp.zeros((1, 33, 33, 3))
    variables = model.init({"params": jax.random.key(0)}, x0,
                           False, None, None)
    p = str(tmp_path / "fcn.shlo")
    save_artifact(export_segmenter(model, variables, (33, 33)), p)
    serve = load_artifact(p)
    x = jnp.asarray(np.random.RandomState(1).randn(3, 33, 33, 3)
                    .astype(np.float32))
    want = model.apply(variables, x, False, None, None)[0]
    assert want.shape == (3, 33, 33, 5)
    # the exported program fuses in a different order than the live
    # jit; deep ResNet accumulation leaves ~4e-5 fp32 noise
    np.testing.assert_allclose(np.asarray(serve(x)), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_cli_export_smoke(tmp_path, capsys):
    from cnsn_tpu.cli import main
    out = str(tmp_path / "m.shlo")
    main(["export", "--config", "cnsn_tpu/configs/cifar10/allconv/cn.yaml",
          "--out", out])
    assert "exported" in capsys.readouterr().out
    serve = load_artifact(out)
    y = serve(jnp.zeros((2, 32, 32, 3)))
    assert y.shape == (2, 10)


def test_pipelined_export_matches_plain(tmp_path):
    """GPipe'd serving export (export_pipelined_classifier): the
    4-stage pipelined artifact's logits equal the plain export's on
    the same weights (BN frozen + per-sample SelfNorm ⇒ microbatch-
    invariant), after a serialize/deserialize round-trip."""
    from cnsn_tpu.serving import export_pipelined_classifier

    model = build_model("resnet50", num_classes=7, pos="residual",
                        cnsn_type="cnsn", crop="neither", beta=1.0)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x0, False, None)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(8, 32, 32, 3).astype(np.float32))

    plain = export_classifier(model, variables, 32)
    piped = export_pipelined_classifier(model, variables, 32,
                                        num_stages=4, batch=8)
    path = str(tmp_path / "piped.shlo")
    save_artifact(piped, path)
    serve = load_artifact(path)
    # a pipelined artifact runs under a num_stages-device context:
    # jit with shardings over the serving mesh supplies it
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cnsn_tpu.parallel import make_mesh
    mesh = make_mesh(4, ("stage",))
    y = jax.jit(serve,
                in_shardings=NamedSharding(mesh, P()))(x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(plain.call(x)),
                               rtol=0, atol=1e-6)


def test_cli_pipelined_export_smoke(tmp_path, capsys):
    from cnsn_tpu.cli import main
    out = str(tmp_path / "p.shlo")
    main(["export", "--config",
          "cnsn_tpu/configs/imagenet/resnet50/cnsn.yaml",
          "--out", out, "--pipeline-stages", "4", "--export-batch", "4",
          "image_size=32"])
    assert "exported" in capsys.readouterr().out
    serve = load_artifact(out)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cnsn_tpu.parallel import make_mesh
    mesh = make_mesh(4, ("stage",))
    y = jax.jit(serve, in_shardings=NamedSharding(mesh, P()))(
        jnp.zeros((4, 32, 32, 3)))
    assert y.shape[0] == 4
