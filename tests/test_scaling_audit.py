"""scaling_audit.py smoke: the HLO collective extraction keeps working
(the SCALING.md numbers are reproducible) and the classifier puts the
hybrid mesh's folded update on the DCN axis."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root (portable, like conftest)

from scaling_audit import (_group_axis, _parse_groups, _shape_bytes,
                           audit, audit_hybrid, link_bytes)


def test_hlo_parsing_helpers():
    assert _shape_bytes("f32[8,4096,16]") == 8 * 4096 * 16 * 4
    assert _shape_bytes("(f32[8], bf16[4,2])") == 32 + 16
    assert _parse_groups("replica_groups={{0,4},{1,5}}, x") == [[0, 4],
                                                                [1, 5]]
    assert _parse_groups("replica_groups=[2,4], y") == [[0, 1, 2, 3],
                                                        [4, 5, 6, 7]]
    # v2 iota with transpose: strided (DCN-axis) groups on a 2x4 grid —
    # decoding this wrong would silently classify DCN traffic as ICI
    assert _parse_groups("replica_groups=[4,2]<=[2,4]T(1,0), z") == [
        [0, 4], [1, 5], [2, 6], [3, 7]]
    assert _parse_groups("replica_groups=[1,8]<=[8], w") == [
        list(range(8))]
    # (dcn=2, ici=4) grid: rows {0..3} / {4..7}
    assert _group_axis([[0, 1, 2, 3], [4, 5, 6, 7]], ici=4) == "ici"
    assert _group_axis([[0, 4], [1, 5]], ici=4) == "dcn"
    assert _group_axis([[0, 1, 4, 5]], ici=4) == "mesh"
    assert link_bytes("all-reduce", 100, 4) == 150.0
    assert link_bytes("all-gather", 100, 4) == 75.0
    assert link_bytes("reduce-scatter", 100, 4) == 300.0


def test_audit_finds_the_production_collectives():
    by_kind, total_link, n_ops, saved = audit(4, batch_per_chip=64)
    assert "all-to-all" in by_kind  # the pooled exchange
    assert "all-reduce" in by_kind  # the MLP-grad reduce
    assert total_link > 0 and n_ops >= 3
    assert saved == 0.0  # no exchange compression requested


def test_audit_measures_bf16_exchange_savings():
    """--exchange-dtype bf16: the a2a exchanges halve on the wire.  The
    savings come from the pre-optimization HLO's wire dtypes (the CPU
    backend widens sub-f32 collectives to f32, so the post-opt inventory
    cannot show them)."""
    import jax.numpy as jnp

    by32, link32, _, saved32 = audit(4, batch_per_chip=64)
    by16, link16, _, saved16 = audit(4, batch_per_chip=64,
                                     exchange_dtype=jnp.bfloat16)
    assert saved32 == 0.0 and saved16 > 0
    # the fwd+bwd slot a2a is the compressed payload: exactly half of it
    a2a = by16["all-to-all"][1]
    assert abs(saved16 - a2a / 2) / a2a < 0.05
    # post-opt totals are the same (CPU widening) — the savings field is
    # where the wire win shows
    assert abs(link16 - link32) < 1e-6


def test_hybrid_audit_classifies_dcn_fold():
    per_axis, totals, saved = audit_hybrid(2, 4, batch_per_chip=64)
    # the folded sparse update rides DCN as all-gathers, and the pooled
    # a2a stays on ICI
    assert totals.get("dcn", 0) > 0
    assert "all-gather" in per_axis["dcn"]
    assert "all-to-all" in per_axis["ici"]
    assert saved == {}


def test_hybrid_audit_bf16_savings_per_axis():
    """bf16 exchange shows savings on BOTH axes: the ICI a2a and the DCN
    gradient fold (ids all-gathers stay int32/uncompressed)."""
    import jax.numpy as jnp

    per_axis, totals, saved = audit_hybrid(2, 4, batch_per_chip=64,
                                           exchange_dtype=jnp.bfloat16)
    assert saved.get("ici", 0) > 0
    assert saved.get("dcn", 0) > 0
    assert saved["ici"] < totals["ici"]
    assert saved["dcn"] < totals["dcn"]
