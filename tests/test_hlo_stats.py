"""Pin the compiled-HLO collective parser the scaling evidence rests on.

`scripts/tp_hlo_stats.py::collective_counts` feeds both the TP mapping
A/B (perf/tp_hlo_stats.jsonl) and the v5e-8 scaling projection
(scripts/scaling_model.py, README "Quantified v5e-8" section): the
projected img/s derives from the all-reduce BYTES it extracts.  The
round-3 advisor found the original regex missed tuple-shaped combined
collectives (94 counted vs 217 present); these cases pin the fixed
parser against hand-built HLO snippets so the bug class cannot return
silently.
"""
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from tp_hlo_stats import collective_counts, shape_bytes  # noqa: E402


class TestShapeBytes:
    def test_simple_array(self):
        assert shape_bytes("f32[128,64]{1,0}") == 128 * 64 * 4

    def test_bf16(self):
        assert shape_bytes("bf16[128,56,56,64]{3,2,1,0}") == (
            128 * 56 * 56 * 64 * 2)

    def test_tuple_sums_components(self):
        assert shape_bytes("(f32[10]{0}, f32[20]{0})") == (10 + 20) * 4

    def test_scalar(self):
        assert shape_bytes("f32[]") == 4

    def test_unknown_dtype_skipped(self):
        # token/opaque components carry no payload
        assert shape_bytes("(f32[8]{0}, token[])") == 32


class TestCollectiveCounts:
    def test_plain_collective(self):
        hlo = "%all-reduce.7 = f32[100]{0} all-reduce(f32[100]{0} %p)\n"
        cc = collective_counts(hlo)
        assert cc["all-reduce"] == {"count": 1, "bytes": 400}

    def test_tuple_shaped_combined_collective(self):
        # ADVICE r3: XLA's all-reduce combiner emits tuple results whose
        # shape contains spaces — a bare \S+ shape pattern misses these
        hlo = ("%all-reduce.2 = (f32[100]{0}, f32[50]{0}) "
               "all-reduce(%a, %b)\n")
        cc = collective_counts(hlo)
        assert cc["all-reduce"]["count"] == 1
        assert cc["all-reduce"]["bytes"] == (100 + 50) * 4

    def test_async_start_variant(self):
        hlo = ("%all-gather-start.3 = bf16[16,8]{1,0} "
               "all-gather-start(%x)\n")
        assert collective_counts(hlo)["all-gather"] == {
            "count": 1, "bytes": 16 * 8 * 2}

    def test_mixed_module(self):
        hlo = (
            "%add.1 = f32[8]{0} add(%a, %b)\n"
            "%all-reduce.1 = f32[8]{0} all-reduce(%add.1)\n"
            "%all-reduce.9 = (f32[8]{0}, f32[4]{0}) all-reduce(%c, %d)\n"
            "%collective-permute.2 = f32[2]{0} collective-permute(%e)\n"
            "%reduce.5 = f32[] reduce(%f, %g)\n"  # NOT a collective
        )
        cc = collective_counts(hlo)
        assert cc["all-reduce"] == {"count": 2, "bytes": (8 + 8 + 4) * 4}
        assert cc["collective-permute"]["count"] == 1
        assert cc["all-gather"]["count"] == 0
        assert cc["all-to-all"]["count"] == 0
