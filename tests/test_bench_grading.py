"""bench.py roofline grading against the committed FLOP-audit artifact.

The driver's end-of-round BENCH_r{N}.json is graded by
bench.grade_against_rooflines from benchmarks/flops_audit.json
(tools/flops_audit.py einsum-truth FLOPs — the round-5 audit showed XLA
cost analysis omits Pallas custom-call dots).  These tests pin the
contract: every audited (preset, res) gets BOTH percentages, an unknown
shape degrades gracefully, and the numbers agree with the artifact.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _audit_rows():
    with open(os.path.join(ROOT, "benchmarks", "flops_audit.json")) as f:
        return json.load(f)["rows"]


def test_audited_shapes_get_both_percentages():
    for row in _audit_rows():
        out = {}
        bench.grade_against_rooflines(out, row["preset"], row["res"], 1.0)
        assert out["sol_source"].startswith("measured rates x audited")
        assert out["pct_of_naive_roofline"] == round(
            100.0 / row["naive_roofline_imgs_per_sec"], 1)
        assert out["pct_of_speed_of_light"] == round(
            100.0 / row["attention_aware_sol_imgs_per_sec"], 1)
        # the aware SOL is a lower ceiling than the naive roofline, so the
        # SOL percentage must be the larger of the two
        assert out["pct_of_speed_of_light"] >= out["pct_of_naive_roofline"]


def test_all_three_bench_presets_are_audited():
    have = {(r["preset"], r["res"]) for r in _audit_rows()}
    assert ("sd-2-1-base", 512) in have
    assert ("sd-2-1-base", 768) in have
    assert ("sdxl-base", 1024) in have


def test_unknown_shape_degrades_gracefully():
    out = {}
    bench.grade_against_rooflines(out, "tiny", 64, 1.0)
    assert "pct_of_naive_roofline" not in out
    assert "pct_of_speed_of_light" not in out


def test_unaudited_512_falls_back_to_sol_denominators(tmp_path,
                                                     monkeypatch):
    # simulate a checkout without the audit artifact: 512 must still grade
    # via the pre-audit measured denominator path
    import shutil

    fake_root = tmp_path / "repo"
    (fake_root / "benchmarks").mkdir(parents=True)
    shutil.copy(os.path.join(ROOT, "benchmarks", "sol_denominators.json"),
                fake_root / "benchmarks" / "sol_denominators.json")
    shutil.copy(os.path.join(ROOT, "bench.py"), fake_root / "bench.py")
    sys.path.insert(0, str(fake_root))
    try:
        import importlib

        spec = importlib.util.spec_from_file_location(
            "bench_fake", fake_root / "bench.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out = {}
        mod.grade_against_rooflines(out, "sd-2-1-base", 512, 5.0)
        assert out["sol_source"] == "measured (tools/bench_sol.py)"
        assert out["pct_of_speed_of_light"] > 0
    finally:
        sys.path.remove(str(fake_root))
