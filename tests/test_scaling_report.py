"""Tests for scripts/scaling_report.py (VERDICT r3 #5).

The report's value is that its comm volumes come from the ACTUAL sharding
rules and the ACTUAL param tree, not hand math — so these tests pin the
walking logic (which weights are row-parallel, what payload they imply)
and the HLO collective parser against known inputs.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import scaling_report as sr


def test_parse_collectives_counts_and_bytes():
    hlo = """
  %ar = bf16[2,64,32]{2,1,0} all-reduce(bf16[2,64,32] %x), replica_groups={}
  %ar2.1 = f32[16]{0} all-reduce-start(f32[16] %y), channel_id=2
  %cp = bf16[8,8]{1,0} collective-permute(bf16[8,8] %z), source_target_pairs={{0,1}}
  %add = bf16[2,64,32]{2,1,0} add(bf16[2,64,32] %a, bf16[2,64,32] %b)
"""
    out = sr.parse_collectives(hlo)
    assert out["all-reduce"] == (2, 2 * 64 * 32 * 2 + 16 * 4)
    assert out["collective-permute"] == (1, 8 * 8 * 2)
    assert "all-gather" not in out


def test_row_parallel_walk_finds_exactly_the_output_projections():
    """The Megatron layout row-shards exactly attn out-proj (x2) and the FFN
    down-proj: 3 stacked weights, each forcing one activation all-reduce per
    layer per step."""
    cfg, shapes = sr.flagship_param_shapes()
    total, entries = sr.tp_allreduce_bytes(
        shapes, rows=2, n_tokens=6144, dtype_bytes=2
    )
    paths = sorted(p for p, *_ in entries)
    assert len(entries) == 3, paths
    assert any("to_out" in p and "attn1" in p for p in paths)
    assert any("to_out" in p and "attn2" in p for p in paths)
    assert any("ff" in p for p in paths)
    inner = cfg.num_attention_heads * cfg.attention_head_dim
    # Every row-parallel output here is the model inner dim, 48 layers each.
    expected = 3 * 48 * 2 * 6144 * inner * 2
    assert total == expected


def test_analytic_modes_are_sane():
    _, step_flops, _, modes = sr.analytic_modes()
    assert step_flops > 100e12  # 19B x 6144 tokens x 2 rows is O(350) TFLOP
    by_name = {m["name"]: m for m in modes}
    # TP doubles devices -> wire grows (ring factor), compute halves.
    assert by_name["TP8"]["compute_s"] == pytest.approx(
        by_name["TP4"]["compute_s"] / 2
    )
    assert by_name["TP8"]["wire_bytes"] > by_name["TP4"]["wire_bytes"]
    # SP moves only K/V chunks: far cheaper than TP's activation all-reduces.
    assert by_name["SP8"]["wire_bytes"] < by_name["TP8"]["wire_bytes"] / 2
    # PP moves only stage-boundary activations: cheapest by far.
    assert by_name["PP4 (2 mb)"]["wire_bytes"] < by_name["SP4"]["wire_bytes"] / 10
    for m in modes:
        assert m["comm_s"] >= 0 and m["compute_s"] > 0
        assert m["wire_bytes"] > 0


def test_report_writes_analytic_sections(tmp_path):
    out = tmp_path / "SCALING.md"
    sr.main(["--output", str(out), "--skip-compile"])
    text = out.read_text()
    assert "Per-mode budget" in text
    assert "TP8" in text and "SP4 x TP2" in text
    assert "all-reduce" in text
