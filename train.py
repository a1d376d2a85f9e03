"""Training CLI — same surface as the reference (`python train.py
<config.json>`, ref train.py:39-47): one JSON config with a `base` key plus
exactly one trainer key. The accelerate/DDP stack (train.py:54-60) is
replaced by a jax.sharding mesh; checkpoints follow the checkpoint-{step}
rotation convention (train.py:353-382) via Orbax."""

import argparse
import json
import logging
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="optional hard cap for smoke runs")
    parser.add_argument("--max_minutes", type=float, default=None,
                        help="wall-clock training budget; stops cleanly "
                             "(final checkpoint + pipeline save) once "
                             "elapsed — for time-boxed runs on shared "
                             "hardware")
    parser.add_argument("--profile", type=int, default=0, metavar="N",
                        help="capture a jax.profiler trace of train steps "
                             "11..10+N into <output_dir>/<logging_dir>/"
                             "profile (view with TensorBoard/XProf)")
    parser.add_argument("--spike_guard", type=float, default=5.0,
                        metavar="F",
                        help="warn when train_loss exceeds F x the running "
                             "median of the last 200 steps (needs >=50 "
                             "history); the ratio is logged to "
                             "metrics.jsonl as loss_spike_ratio. 0 disables")
    parser.add_argument("--nan_guard", type=int, default=3, metavar="K",
                        help="failure detection (SURVEY.md §5.3; the "
                             "reference has none): on a non-finite loss, "
                             "restore the latest checkpoint and continue; "
                             "abort after K consecutive restores. 0 "
                             "disables")
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a jax backend (the JAX_PLATFORMS env "
                             "var is consumed at interpreter startup on "
                             "runtimes with a sitecustomize, so smoke "
                             "runs need an in-process override)")
    args = parser.parse_args()

    import jax
    # persistent XLA compile cache (SURVEY §2.1 custom_ops JIT cache
    # equivalent): resumed/restarted runs skip the minutes-long remote
    # compile of the big train step
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from afldm_tpu.parallel.mesh import initialize_distributed

    # multi-host bring-up before any backend touch (no-op single-process;
    # set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID per
    # host — the accelerate-launch replacement, SURVEY.md §2.11)
    multihost = initialize_distributed()

    from afldm_tpu.train import (load_training_config, create_trainer,
                                 make_dataset, epoch_batches,
                                 save_checkpoint, restore_checkpoint,
                                 wait_for_checkpoints,
                                 latest_checkpoint)
    from afldm_tpu.train.checkpoint import resume_step_from_path

    # force=True: the TPU runtime bootstrap may already have configured the
    # root logger (at WARNING), which would silently eat all INFO logs
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        force=True)
    log = logging.getLogger("train")

    is_main = jax.process_index() == 0
    if multihost:
        log.info("multi-host: process %d/%d", jax.process_index(),
                 jax.process_count())

    cfgs = load_training_config(args.config)
    base = cfgs["base"]
    trainer_key = next(k for k in cfgs if k != "base")
    cfg = cfgs[trainer_key]

    if getattr(base, "af_precision", "highest") != "highest":
        from afldm_tpu.ops.ideal_lpf import set_af_precision
        set_af_precision(base.af_precision)
        log.warning("alias-free matmul precision: %s", base.af_precision)

    os.makedirs(base.output_dir, exist_ok=True)
    os.makedirs(os.path.join(base.output_dir, base.logging_dir),
                exist_ok=True)

    trainer = create_trainer(trainer_key, base, cfg)
    log.info("devices: %s mesh: %s", jax.devices(), trainer.mesh)

    trainer.init_modules()
    dataset = make_dataset(base)
    trainer.set_dataset(dataset)
    steps_per_epoch = len(dataset) // base.train_batch_size
    total_steps = steps_per_epoch * base.num_epochs
    trainer.init_optimizers(total_steps)
    trainer.prepare_modules()

    global_step = 0
    if base.resume_from_checkpoint:
        path = (latest_checkpoint(base.output_dir)
                if base.resume_from_checkpoint == "latest"
                else base.resume_from_checkpoint)
        if path:
            log.info("resuming from %s", path)
            state = restore_checkpoint(path, jax.device_get(
                trainer.state_for_checkpoint()))
            # place by the trainer's sharding rules (TP-aware; replicated
            # at model_parallel=1) — a replicated device_put here would
            # undo the 'model'-axis sharding and blow the memory budget
            trainer.load_state(trainer.place_state(state))
            global_step = resume_step_from_path(path)

    metrics_path = os.path.join(base.output_dir, base.logging_dir,
                                "metrics.jsonl")
    mfile = open(metrics_path, "a")
    tb = None
    if base.logger == "tensorboard":
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb = SummaryWriter(os.path.join(base.output_dir,
                                            base.logging_dir))
        except Exception as e:  # tensorboard optional
            log.warning("tensorboard unavailable (%s); JSONL only", e)

    # preemption safety (SURVEY.md §5.3 gap in the reference): checkpoint
    # on SIGTERM/SIGINT before exiting so "resume_from_checkpoint: latest"
    # loses at most the in-flight step
    import signal

    def _save_and_exit(signum, frame):
        log.warning("signal %d: writing checkpoint-%d before exit", signum,
                    global_step)
        # join the shared checkpointer's background commit thread first —
        # otherwise two writers may rename tmp dirs onto the same
        # checkpoint-{step} destination (ADVICE r2). Safe from the handler:
        # it joins the commit thread, not the interrupted main thread.
        wait_for_checkpoints()
        # fresh=True: the handler may have interrupted the main thread
        # inside the shared checkpointer's save(); use a private one
        save_checkpoint(base.output_dir, global_step,
                        jax.device_get(trainer.state_for_checkpoint()),
                        total_limit=base.checkpoints_total_limit,
                        fresh=True)
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, _save_and_exit)
    signal.signal(signal.SIGINT, _save_and_exit)

    log.info("training %s: %d steps/epoch, %d epochs", trainer_key,
             steps_per_epoch, base.num_epochs)
    from afldm_tpu.utils.training_stats import Collector
    collector = Collector()
    t0 = time.time()
    done = False
    prof = None
    nan_restores = 0
    # loss-spike guard: the shift loss is an UNNORMALIZED latent-space MSE
    # whose per-step variance tracks the random shift offset and the latent
    # scale (see BENCH_NOTES "AF-VAE shift-loss variance"), so single high
    # samples are expected — the guard flags sustained departures from the
    # running median rather than silencing them
    from collections import deque
    loss_hist = deque(maxlen=200)
    profile_start = global_step + 10  # steady state, resume-safe
    for epoch in range(base.num_epochs):
        if done:
            break
        for batch in epoch_batches(dataset, base.train_batch_size,
                                   seed=(base.seed or 0) + epoch,
                                   process_index=jax.process_index(),
                                   process_count=jax.process_count()):
            # idempotent resume: a re-run of a completed stage must not
            # train past max_steps (it would break A/B step-matching)
            if args.max_steps and global_step >= args.max_steps:
                done = True
                break
            # profile a window after warmup/compile so the trace holds
            # steady-state steps only (SURVEY.md §5.1)
            if args.profile and global_step == profile_start:
                from afldm_tpu.utils.profiling import trace
                prof_dir = os.path.join(base.output_dir, base.logging_dir,
                                        "profile")
                prof = trace(prof_dir)
                prof.__enter__()
                log.info("profiling %d steps -> %s", args.profile, prof_dir)
            logs = trainer.training_step(global_step, batch)
            for k, v in logs.items():
                collector.report(k, v)
            if args.nan_guard and not np.isfinite(
                    logs.get("train_loss", 0.0)):
                nan_restores += 1
                log.error("non-finite loss at step %d (%s); restore #%d",
                          global_step, logs, nan_restores)
                if nan_restores >= args.nan_guard:
                    raise RuntimeError(
                        f"{nan_restores} consecutive non-finite losses — "
                        "aborting (use --nan_guard 0 to disable)")
                path = latest_checkpoint(base.output_dir)
                if path:
                    state = restore_checkpoint(path, jax.device_get(
                        trainer.state_for_checkpoint()))
                    trainer.load_state(trainer.place_state(state))
                    log.warning("restored %s; skipping this batch", path)
                continue
            nan_restores = 0
            if args.spike_guard:
                lv = logs.get("train_loss")
                if lv is not None and np.isfinite(lv):
                    if len(loss_hist) >= 50:
                        med = float(np.median(loss_hist))
                        ratio = lv / max(med, 1e-12)
                        if ratio > args.spike_guard:
                            log.warning(
                                "loss spike at step %d: train_loss %.4g is "
                                "%.1fx the running median %.4g", global_step,
                                lv, ratio, med)
                        collector.report("loss_spike_ratio", ratio)
                    loss_hist.append(lv)
            global_step += 1
            if prof is not None and global_step == profile_start + args.profile:
                prof.__exit__(None, None, None)
                prof = None
                log.info("profile written")
            if global_step % 10 == 0:
                # window means via the stats collector (ref
                # training_stats.Collector, training_stats.py:113-234),
                # not the last step's instantaneous values
                logs = {k: collector.mean(k) for k in collector.names()}
                collector.reset()
                logs["step"] = global_step
                logs["steps_per_s"] = global_step / (time.time() - t0)
                mfile.write(json.dumps(logs) + "\n")
                mfile.flush()
                if tb is not None:
                    for k, v in logs.items():
                        if k != "step":
                            tb.add_scalar(k, v, global_step)
                log.info("step %d %s", global_step,
                         {k: round(v, 5) for k, v in logs.items()})
            if global_step % base.checkpointing_steps == 0 and is_main:
                # async: the write commits in the background while training
                # continues; exit paths below block on wait/save
                save_checkpoint(base.output_dir, global_step,
                                jax.device_get(
                                    trainer.state_for_checkpoint()),
                                total_limit=base.checkpoints_total_limit,
                                block=False)
                log.info("scheduled checkpoint-%d", global_step)
            if base.valid_steps and global_step % base.valid_steps == 0:
                v = trainer.validate(global_step)
                log.info("validation @%d: %s", global_step,
                         {k: v[k] for k in v if np.isscalar(v[k])})
                if tb is not None:
                    for k, val in v.items():
                        if np.isscalar(val):
                            tb.add_scalar(f"val/{k}", val, global_step)
                        elif (isinstance(val, np.ndarray)
                              and val.ndim == 4):
                            # NHWC [-1,1] or [0,1] -> [0,1]
                            img = val if val.min() >= 0 else val / 2 + 0.5
                            tb.add_images(f"val/{k}",
                                          np.clip(img, 0, 1),
                                          global_step, dataformats="NHWC")
            if args.max_steps and global_step >= args.max_steps:
                done = True
                break
            if (args.max_minutes
                    and time.time() - t0 > args.max_minutes * 60):
                log.info("wall-clock budget (%.1f min) reached at step %d",
                         args.max_minutes, global_step)
                done = True
                break
        # epoch-cadence validation (ref train.py:393 valid_epochs)
        if base.valid_epochs and ((epoch + 1) % base.valid_epochs == 0
                                  or epoch == base.num_epochs - 1):
            v = trainer.validate(global_step)
            log.info("validation (epoch %d): %s", epoch,
                     {k: v[k] for k in v if np.isscalar(v[k])})
        if ((base.save_model_epochs
             and (epoch + 1) % base.save_model_epochs == 0) or done) \
                and is_main:
            trainer.save_pipeline(os.path.join(base.output_dir, "pipeline"))
            log.info("saved pipeline (epoch %d)", epoch)

    if prof is not None:  # training ended inside the profile window
        prof.__exit__(None, None, None)
        log.info("profile written (training ended inside the window)")

    if is_main:
        save_checkpoint(base.output_dir, global_step,
                        jax.device_get(trainer.state_for_checkpoint()),
                        total_limit=base.checkpoints_total_limit)
        trainer.save_pipeline(os.path.join(base.output_dir, "pipeline"))
    wait_for_checkpoints()
    log.info("done at step %d", global_step)


if __name__ == "__main__":
    main()
