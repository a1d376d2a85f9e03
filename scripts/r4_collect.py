"""Collect round-4 TPU measurement artifacts into BENCH_NOTES.md and
results/benchmarks.json.

Runs after every TPU-queue milestone (scripts/r5_queue.sh
commit_evidence), so the numbers are recorded the
moment the queue finishes even if no interactive session is alive
(round-3 failure mode: measurement scripts ran, numbers never landed in
the notes — VERDICT r3 items 2/3).

Idempotent: the auto-collected section of BENCH_NOTES.md is delimited by
markers and replaced wholesale on re-run; missing artifacts are listed as
"pending", never invented.
"""
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTES = os.path.join(ROOT, "BENCH_NOTES.md")
BEGIN = "<!-- R4_AUTO_BEGIN (scripts/r4_collect.py) -->"
END = "<!-- R4_AUTO_END -->"


def _jsonl(path):
    rows = []
    try:
        with open(os.path.join(ROOT, path)) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except ValueError:
                    continue
    except FileNotFoundError:
        pass
    return rows


def _json(path):
    try:
        with open(os.path.join(ROOT, path)) as f:
            return json.load(f)
    except (FileNotFoundError, ValueError):
        return None


def sdpa2_section(out):
    # keep only the LAST row per (shape, dtype): earlier rows may predate
    # the in-graph-chaining instrument (call-by-call timing is
    # relay-latency-diluted — see the methodology note above)
    rows = {}
    for r in _jsonl("results/bench_sdpa2.json"):
        rows[(tuple(r.get("shape", [])), r.get("dtype"))] = r
    out.append("### Two-KV fused CFA-interp attention, per-op "
               "(scripts/bench_sdpa2.py)")
    if not rows:
        out.append("*pending (relay)*")
        return
    out.append("| shape (B,H,L,D) | dtype | unfused ms | fused ms | "
               "speedup | max abs diff |")
    out.append("|---|---|---|---|---|---|")
    for (shape, dt), r in sorted(rows.items(), key=str):
        out.append(f"| {list(shape)} | {dt} | {r['unfused_ms']} | "
                   f"{r['fused_ms']} | {r['speedup']}x | "
                   f"{r['max_abs_diff']:.2e} |")


def interp_section(out):
    rows = {}
    for r in _jsonl("results/bench_interp_denoise.json"):
        rows[(r.get("frames"), r.get("steps"), r.get("dtype"))] = r
    out.append("### Interp-denoise end-to-end fused-vs-unfused "
               "(scripts/bench_interp_denoise.py)")
    if not rows:
        out.append("*pending (relay)*")
        return
    out.append("| frames | steps | dtype | unfused ms/step | "
               "fused ms/step | speedup | checksum rel diff |")
    out.append("|---|---|---|---|---|---|---|")
    for k, r in sorted(rows.items(), key=str):
        out.append(f"| {r['frames']} | {r['steps']} | {r['dtype']} | "
                   f"{r['unfused_ms_per_step']} | {r['fused_ms_per_step']} "
                   f"| {r['speedup']}x | {r['checksum_rel_diff']:.2e} |")


def roofline_section(out):
    out.append("### Denoise-step attribution (scripts/roofline_denoise.py, "
               "in-graph chain, batch 8)")
    any_found = False
    for dt in ("bf16", "f32"):
        r = _json(f"results/roofline_denoise_{dt}.json")
        if not r:
            continue
        any_found = True
        out.append(f"**{dt}** (batch {r.get('batch')}):")
        out.append("| variant | ms/step |")
        out.append("|---|---|")
        for k, v in r.items():
            if k.endswith("_ms"):
                out.append(f"| {k[:-3]} | {v} |")
        shares = {k: v for k, v in r.items() if k.endswith("_share")}
        if shares:
            out.append("")
            out.append("| component | share of step |")
            out.append("|---|---|")
            for k, v in shares.items():
                out.append(f"| {k[:-6]} | {v * 100:.1f}% |")
        out.append("")
    if not any_found:
        out.append("*pending (relay)*")


def precision_section(out):
    r = _json("results/af_precision_eval.json")
    out.append("### set_af_precision('high') vs eval PSNR "
               "(scripts/eval_af_precision.py)")
    if not r:
        out.append("*pending (relay)*")
        return
    out.append(f"- highest: {r['highest']['mean_masked_psnr']} dB mean "
               f"masked PSNR; high: {r['high']['mean_masked_psnr']} dB "
               f"({r['high_minus_highest_db']:+} dB, "
               f"{'within' if r['within_0p1_db'] else 'OUTSIDE'} the "
               f"0.1 dB budget) — {r['eval_steps']} eval steps, "
               f"{r['shift_steps']} shifts")
    for prec, row in r.items():
        if prec in ("highest", "high") or not isinstance(row, dict):
            continue
        delta = r.get(f"{prec}_minus_highest_db")
        out.append(f"- {prec}: {row['mean_masked_psnr']} dB "
                   f"({delta:+} dB vs highest, "
                   f"{'within' if abs(delta) <= 0.1 else 'OUTSIDE'} the "
                   f"0.1 dB budget)")


def flagship_section(out):
    r = _json("results/flagship_ab/report.json")
    out.append("### Flagship 256px naive-vs-AF A/B "
               "(scripts/flagship_ab.py report)")
    if not r:
        out.append("*pending (relay: naive retrain + dual eval queued)*")
        return
    out.append(f"- AF arm:    {r['af']['mean_masked_psnr']} dB mean masked "
               f"PSNR ({r['af'].get('vae_train_steps')} VAE / "
               f"{r['af'].get('ldm_train_steps')} LDM steps)")
    out.append(f"- naive arm: {r['naive']['mean_masked_psnr']} dB "
               f"({r['naive'].get('vae_train_steps')} VAE / "
               f"{r['naive'].get('ldm_train_steps')} LDM steps)")
    out.append(f"- **AF gain: {r['af_psnr_gain_db']:+} dB overall, "
               f"{r['af_frac_shift_gain_db']:+} dB on fractional shifts** "
               f"(step_matched={r['step_matched']})")


def train_section(out):
    rows = {}
    for r in _jsonl("results/bench_train_r4.jsonl"):
        rows[(r.get("batch"), r.get("mixed_precision"),
              r.get("gradient_checkpointing"), r.get("remat_policy"),
              r.get("af_precision", "highest"),
              r.get("af_models", True), r.get("shift_loss", True))] = r
    out.append("### Training step throughput / MFU (scripts/bench_train.py)")
    if not rows:
        out.append("*pending (relay)*")
        return
    out.append("| batch | precision | remat | policy | af_prec | variant | "
               "img/s | TFLOP/s | MFU |")
    out.append("|---|---|---|---|---|---|---|---|---|")
    for k, r in sorted(rows.items(), key=str):
        mfu = r.get("mfu_vs_197tflops_bf16")
        mfu_s = f"{mfu * 100:.1f}%" if mfu is not None else "?"
        variant = ("naive" if not r.get("af_models", True) else
                   "no_shift" if not r.get("shift_loss", True) else "af")
        out.append(f"| {r['batch']} | {r['mixed_precision']} | "
                   f"{r['gradient_checkpointing']} | "
                   f"{r.get('remat_policy', 'full')} | "
                   f"{r.get('af_precision', 'highest')} | {variant} | "
                   f"{r['images_per_s']} "
                   f"| {r.get('tflop_per_s', '?')} | {mfu_s} |")


def sweep_section(out):
    rows = _jsonl("results/bench_flash_sweep.json")
    out.append("### Flash-kernel block sweep + attribution "
               "(scripts/bench_flash_sweep.py)")
    if not rows:
        out.append("*pending (relay)*")
        return
    sweeps = {}
    probes = {}
    for r in rows:    # last row per key wins (re-runs refine)
        if r.get("kind") == "sweep" and "ms" in r:
            sweeps[(r["op"], r["bq"], r["bk"], r["dtype"])] = r
        elif r.get("kind") == "probe":
            probes[(r["op"], r["dtype"])] = r
    if sweeps:
        out.append("| op | dtype | block_q | block_k | ms |")
        out.append("|---|---|---|---|---|")
        for k, r in sorted(sweeps.items(), key=str):
            out.append(f"| {r['op']} | {r['dtype']} | {r['bq']} | "
                       f"{r['bk']} | {r['ms']} |")
    for k, r in sorted(probes.items(), key=str):
        out.append(f"- probe {r['op']}/{r['dtype']} @ bq={r['bq']} "
                   f"bk={r['bk']}: flash {r['flash_ms']} ms, dots-only "
                   f"{r['dots_only_ms']} ms, stream-only "
                   f"{r['stream_only_ms']} ms -> softmax-VPU share "
                   f"~{r['softmax_share'] * 100:.0f}%, memory share "
                   f"~{r['mem_share'] * 100:.0f}%")


def bwd_sweep_section(out):
    d = _json("results/bench_flash_bwd_sweep.json")
    out.append("### Flash-kernel bwd-inclusive block sweep "
               "(scripts/bench_flash_bwd_sweep.py; full value-and-grad "
               "scan chain = fwd + dq + dkv kernels, the training usage)")
    if not d:
        out.append("*pending (relay)*")
        return
    rows = [r for r in d.get("rows", []) if r.get("kind") == "bwd_sweep"]
    if rows:
        out.append("| dtype | block_q | block_k | grad ms | fwd ms | "
                   "bwd ms |")
        out.append("|---|---|---|---|---|---|")
        for r in sorted(rows, key=lambda r: (r["dtype"], r["bq"], r["bk"])):
            if "grad_ms" in r:
                out.append(f"| {r['dtype']} | {r['bq']} | {r['bk']} | "
                           f"{r['grad_ms']} | {r['fwd_ms']} | "
                           f"{r['bwd_ms']} |")
            else:
                out.append(f"| {r['dtype']} | {r['bq']} | {r['bk']} | "
                           f"error: {r.get('error', '?')[:60]} | | |")
    for r in d.get("rows", []):
        if r.get("kind") == "summary":
            out.append(f"- {r['dtype']}: best block "
                       f"{tuple(r['best_block'])} at {r['best_grad_ms']} "
                       f"ms vs (512, 1024) default {r['default_grad_ms']} "
                       f"ms = {r['speedup_vs_default']}x")


def gen_fd_section(out):
    out.append("### Generation-quality Frechet distance "
               "(scripts/eval_gen_fd.py; pixel + random-VGG features "
               "cross-arm comparable, Inception egress-blocked)")
    found = False
    for arm in ("naive", "af"):
        for tag, path in (("", f"results/flagship_ab/{arm}/gen_fd.json"),
                          (" [pass-1]",
                           f"results/flagship_ab/{arm}/gen_fd_p1.json")):
            r = _json(path)
            if not r:
                continue
            found = True
            rv = r.get("fd_rvgg")
            rv_s = f"FD(rvgg-896d) {rv}, " if rv is not None else ""
            out.append(f"- {arm}{tag}: FD(pixel-pool) {r['fd_pixel_pool']}, "
                       f"{rv_s}FD(own-VAE latent) {r['fd_vae_latent']} "
                       f"({r['num_samples']} samples vs {r['num_real']} "
                       f"real, {r['steps']} steps)")
    if not found:
        out.append("*pending (relay: runs after the A/B arms train)*")


def eq_metrics_section(out):
    rows = {arm: _json(f"results/eq_metrics_{arm}.json")
            for arm in ("naive", "af")}
    if not any(rows.values()):
        return  # optional bonus evidence: omit entirely until measured
    out.append("### StyleGAN-3 EQ metrics on the trained arms "
               "(scripts/eval_equivariance.py — the reference ships "
               "compute_equivariance_metrics but never invokes it)")
    for arm, r in rows.items():
        if not r:
            out.append(f"- {arm}: *pending (relay)*")
            continue
        out.append(f"- {arm}: EQ-T {r['eq_t_db']} dB, EQ-T_frac "
                   f"{r['eq_t_frac_db']} dB ({r['num_samples']} samples, "
                   f"{r['steps']} steps, translate_max "
                   f"{r['translate_max']})")
    out.append("")


def serve_section(out):
    r = _json("results/bench_serve.json")
    out.append("### Serving throughput (scripts/bench_serve.py, "
               "SamplerService at flagship size)")
    if not r:
        out.append("*pending (relay)*")
        return
    s, c = r["serial"], r["concurrent"]
    out.append(f"- workload: {r['workload']}")
    out.append(f"- serial (1 client): {s['samples_per_s']} samples/s, "
               f"p50 latency {s['p50_latency_s']} s")
    out.append(f"- concurrent ({c['clients']} clients): "
               f"{c['samples_per_s']} samples/s, p50 latency "
               f"{c['p50_latency_s']} s, {c['device_batches']} device "
               f"dispatches for {c['requests']} requests")
    out.append(f"- **microbatching speedup: "
               f"{r['microbatching_speedup']}x**")


def headline_section(out):
    rows = _jsonl("BENCH_HISTORY.jsonl")
    out.append("### Headline bench history (bench.py drift guard)")
    if not rows:
        out.append("*pending (relay)*")
        return
    last = rows[-1]
    best = max(r.get("steps_per_s", 0.0) for r in rows)
    out.append(f"- latest: {last.get('steps_per_s')} steps/s "
               f"(best recorded: {best}; {len(rows)} runs tracked)")


def update_benchmarks_json():
    path = os.path.join(ROOT, "results", "benchmarks.json")
    bm = _json("results/benchmarks.json") or {}
    fd = {arm: _json(f"results/flagship_ab/{arm}/gen_fd.json")
          for arm in ("naive", "af")}
    if all(fd.values()):
        bm["flagship_gen_fd"] = {
            arm: {k: fd[arm][k] for k in
                  ("fd_pixel_pool", "fd_rvgg", "fd_vae_latent")
                  if k in fd[arm]}
            for arm in fd}
    rep = _json("results/flagship_ab/report.json")
    if rep:
        bm["flagship_ab_256px"] = {
            "af_mean_masked_psnr": rep["af"]["mean_masked_psnr"],
            "naive_mean_masked_psnr": rep["naive"]["mean_masked_psnr"],
            "af_psnr_gain_db": rep["af_psnr_gain_db"],
            "af_frac_shift_gain_db": rep["af_frac_shift_gain_db"],
            "step_matched": rep["step_matched"],
            "weights": "trained",
        }
        bm["_note"] = ("weights=random entries are plumbing-on-random-"
                       "weights, NOT parity evidence; flagship_ab_256px "
                       "(trained) is the equivariance demonstration — "
                       "full detail in results/flagship_ab/report.json")
    with open(path, "w") as f:
        json.dump(bm, f, indent=2)


def main():
    out = [BEGIN, "## Round-4 recorded numbers (auto-collected)", ""]
    sdpa2_section(out)
    out.append("")
    interp_section(out)
    out.append("")
    roofline_section(out)
    precision_section(out)
    out.append("")
    train_section(out)
    out.append("")
    flagship_section(out)
    out.append("")
    gen_fd_section(out)
    out.append("")
    eq_metrics_section(out)
    sweep_section(out)
    out.append("")
    bwd_sweep_section(out)
    out.append("")
    serve_section(out)
    out.append("")
    headline_section(out)
    out.append(END)
    block = "\n".join(out) + "\n"

    with open(NOTES) as f:
        text = f.read()
    if BEGIN in text:
        pre = text[:text.index(BEGIN)]
        post = text[text.index(END) + len(END):].lstrip("\n")
        text = pre + block + post
    else:
        text = text.rstrip("\n") + "\n\n" + block
    with open(NOTES, "w") as f:
        f.write(text)

    update_benchmarks_json()
    print("collected -> BENCH_NOTES.md, results/benchmarks.json")


if __name__ == "__main__":
    main()
