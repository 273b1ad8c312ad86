"""Communication-shape regression (VERDICT r1 item 9): the multi-chip paths'
collective structure — op kinds, counts, and byte scaling with the mesh —
verified from compiled HLO on the virtual 8-device mesh. Keeps the first real
multi-chip run turn-key: any accidental extra collective or halo growth fails
here before touching hardware."""

import jax
import pytest

from deeprank2_tpu.parallel.comm_shape import (
    blocksparse_ring_report,
    collective_stats,
    dp_train_report,
    edge_partition_report,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device virtual mesh")


def test_hlo_parser() -> None:
    text = """
      %ar = f32[16,32]{1,0} all-reduce(f32[16,32]{1,0} %x), replica_groups={}
      %ag.1 = (f32[8]{0}, bf16[4,2]{1,0}) all-gather-start(f32[4]{0} %y)
      %agd = f32[8]{0} all-gather-done(%ag.1)
      %cp = u8[128]{0} collective-permute(%z), source_target_pairs={{0,1}}
    """
    stats = collective_stats(text)
    assert stats["all-reduce"] == {"count": 1, "bytes": 16 * 32 * 4}
    assert stats["all-gather"] == {"count": 1, "bytes": 8 * 4 + 4 * 2 * 2}  # -done not double counted
    assert stats["collective-permute"] == {"count": 1, "bytes": 128}


def test_dp_shape_is_one_fused_allreduce() -> None:
    """DP = exactly one fused gradient all-reduce whose payload (grads + loss)
    does not grow with the mesh; no gathers, no permutes."""
    reports = [dp_train_report(d) for d in (2, 4, 8)]
    for r in reports:
        assert r["all-reduce"]["count"] == 1
        assert r["all-gather"]["count"] == 0
        assert r["collective-permute"]["count"] == 0
    assert len({r["all-reduce"]["bytes"] for r in reports}) == 1


def test_edge_partition_gathers_constant_bytes() -> None:
    """Edge partitioning issues one all_gather per conv per tower (4 total);
    gathered bytes equal the full node-feature arrays, independent of D."""
    reports = [edge_partition_report(d) for d in (2, 4, 8)]
    for r in reports:
        assert r["all-gather"]["count"] == 4
        assert r["collective-permute"]["count"] == 0
    assert len({r["all-gather"]["bytes"] for r in reports}) == 1


def test_ring_halo_bytes_shrink_with_mesh() -> None:
    """The ppermute ring replaces every all_gather with a permute whose
    payload is the 1/D node slice — per-step halo bytes halve as D doubles."""
    reports = {d: edge_partition_report(d, ring=True) for d in (2, 4, 8)}
    for r in reports.values():
        assert r["all-gather"]["count"] == 0
        assert r["collective-permute"]["count"] == 4
    assert reports[4]["collective-permute"]["bytes"] == reports[2]["collective-permute"]["bytes"] // 2
    assert reports[8]["collective-permute"]["bytes"] == reports[4]["collective-permute"]["bytes"] // 2


def test_blocksparse_ring_unrolls_per_source() -> None:
    """The BCSR ring is statically unrolled: 2 SpMM layers x (D-1) rotations,
    each permuting the same-size local node block."""
    r2, r4 = blocksparse_ring_report(2), blocksparse_ring_report(4)
    assert r2["collective-permute"]["count"] == 2 * (2 - 1)
    assert r4["collective-permute"]["count"] == 2 * (4 - 1)
    assert r2["all-gather"]["count"] == r4["all-gather"]["count"] == 0
    per_hop2 = r2["collective-permute"]["bytes"] / r2["collective-permute"]["count"]
    per_hop4 = r4["collective-permute"]["bytes"] / r4["collective-permute"]["count"]
    assert per_hop4 <= per_hop2  # a hop carries one local slice, never more
