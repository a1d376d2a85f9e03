"""scripts/r4_collect.py is load-bearing for round-4 evidence recording
(it writes the measured numbers into BENCH_NOTES.md + benchmarks.json as
the TPU queue's final step). Pin its three contracts: marker-delimited
idempotent replacement, last-row-wins for re-measured JSONL keys, and
pending-not-invented for missing artifacts."""

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _setup(tmp_path, monkeypatch):
    rc = importlib.import_module("r4_collect")
    monkeypatch.setattr(rc, "ROOT", str(tmp_path))
    monkeypatch.setattr(rc, "NOTES", str(tmp_path / "BENCH_NOTES.md"))
    (tmp_path / "results").mkdir()
    (tmp_path / "BENCH_NOTES.md").write_text("# Notes\n\npre-existing\n")
    return rc


def test_pending_sections_and_idempotency(tmp_path, monkeypatch):
    rc = _setup(tmp_path, monkeypatch)
    rc.main()
    text = (tmp_path / "BENCH_NOTES.md").read_text()
    assert "pre-existing" in text
    assert text.count(rc.BEGIN) == 1
    assert "*pending (relay)*" in text
    # second run replaces, never duplicates
    rc.main()
    text2 = (tmp_path / "BENCH_NOTES.md").read_text()
    assert text2.count(rc.BEGIN) == 1
    assert text2.count("Two-KV fused") == 1
    # benchmarks.json written without a flagship report: no trained entry
    bm = json.loads((tmp_path / "results" / "benchmarks.json").read_text())
    assert "flagship_ab_256px" not in bm


def test_last_row_wins_and_report(tmp_path, monkeypatch):
    rc = _setup(tmp_path, monkeypatch)
    with open(tmp_path / "results" / "bench_sdpa2.json", "w") as f:
        # same key measured twice: the re-measurement must win
        f.write(json.dumps({"shape": [2, 2, 64, 16], "dtype": "f32",
                            "unfused_ms": 9.0, "fused_ms": 9.0,
                            "speedup": 1.0, "max_abs_diff": 0.0}) + "\n")
        f.write("{corrupt\n")  # truncated line must be skipped
        f.write(json.dumps({"shape": [2, 2, 64, 16], "dtype": "f32",
                            "unfused_ms": 4.0, "fused_ms": 2.0,
                            "speedup": 2.0, "max_abs_diff": 0.0}) + "\n")
    ab = tmp_path / "results" / "flagship_ab"
    ab.mkdir()
    arms = {"af": 21.7, "naive": 19.2}
    rep = {a: {"mean_masked_psnr": p, "vae_train_steps": 2020,
               "ldm_train_steps": 4500} for a, p in arms.items()}
    rep.update(step_matched=True, af_psnr_gain_db=2.5,
               af_frac_shift_gain_db=3.1)
    (ab / "report.json").write_text(json.dumps(rep))
    rc.main()
    text = (tmp_path / "BENCH_NOTES.md").read_text()
    assert "| 2.0x |" in text and "| 1.0x |" not in text
    assert "+2.5 dB overall" in text
    bm = json.loads((tmp_path / "results" / "benchmarks.json").read_text())
    assert bm["flagship_ab_256px"]["af_psnr_gain_db"] == 2.5
    assert bm["flagship_ab_256px"]["weights"] == "trained"


def test_precision_ladder_section(tmp_path, monkeypatch):
    rc = _setup(tmp_path, monkeypatch)
    (tmp_path / "results" / "af_precision_eval.json").write_text(json.dumps({
        "highest": {"mean_masked_psnr": 27.3378},
        "high": {"mean_masked_psnr": 27.3516},
        "default": {"mean_masked_psnr": 27.1,
                    "psnrs": [27.0, 27.2]},  # extra keys must not render
        "high_minus_highest_db": 0.0138,
        "default_minus_highest_db": -0.2378,
        "within_0p1_db": True, "eval_steps": 50, "shift_steps": 8}))
    rc.main()
    text = (tmp_path / "BENCH_NOTES.md").read_text()
    assert "high: 27.3516 dB (+0.0138 dB, within" in text
    # the extra arm renders with its own delta and budget verdict
    assert "- default: 27.1 dB (-0.2378 dB vs highest, OUTSIDE" in text


def test_serve_section(tmp_path, monkeypatch):
    rc = _setup(tmp_path, monkeypatch)
    (tmp_path / "results" / "bench_serve.json").write_text(json.dumps({
        "workload": "FFHQ-256 AF-LDM 50-step denoise + VAE decode",
        "steps": 50,
        "serial": {"requests": 8, "samples_per_s": 2.5,
                   "p50_latency_s": 0.4},
        "concurrent": {"clients": 8, "requests": 24, "samples_per_s": 8.1,
                       "p50_latency_s": 0.9, "device_batches": 4},
        "microbatching_speedup": 3.24}))
    rc.main()
    text = (tmp_path / "BENCH_NOTES.md").read_text()
    assert "microbatching speedup: 3.24x" in text
    assert "8.1 samples/s" in text
