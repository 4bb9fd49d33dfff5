"""CLIP-Event TPU training entry point (reference `train.py`).

Usage (same contract as the reference, README.md:204-209):
    python train.py --cfg config.json

Multi-host TPU: launch once per host; `jax.distributed` handles rendezvous
(no torch.distributed.launch / MPI adapter needed — pod runtimes export the
coordinator env).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import pprint
import sys
import time


log = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser(description="Train CLIP-Event (TPU)")
    parser.add_argument("--cfg", type=str, required=True, help="config JSON path")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace of epoch 0 here")
    return parser.parse_args()


def main():
    args = parse_args()

    from clip_event_tpu.config import load_config, model_config
    from clip_event_tpu.parallel.mesh import initialize_distributed
    from clip_event_tpu.platform import ensure_backend

    ensure_backend()

    cfg = load_config(args.cfg)
    initialize_distributed()

    import jax
    import jax.numpy as jnp

    from clip_event_tpu.data.common import DataLoader
    from clip_event_tpu.data.prefetch import device_prefetch
    from clip_event_tpu.data.voa import VOADescriptionDataset
    from clip_event_tpu.engine.checkpoint import (
        import_initial_checkpoint,
        load_meta,
        restore_checkpoint,
        save_checkpoint,
    )
    from clip_event_tpu.engine.metrics import MetricLogger, ScalarWriter, create_logger
    from clip_event_tpu.engine.optim import build_optimizer, build_schedule
    from clip_event_tpu.engine.train_step import (
        create_train_state,
        make_accum_step,
        make_multi_step,
        make_train_step,
    )
    from clip_event_tpu.models import init_params
    from clip_event_tpu.parallel import make_mesh, replicate

    task = cfg["task"]
    tb_log_dir = os.path.join(cfg["tb_log_dir"], task, "tensorboard")
    log_dir = os.path.join(cfg["tb_log_dir"], task, "log")
    ckpt_dir = os.path.join(cfg["ckpt_dir"])
    for d in (tb_log_dir, log_dir, os.path.join(ckpt_dir, task)):
        os.makedirs(d, exist_ok=True)
    create_logger(task, log_dir, cfg["log_level"])

    if jax.process_index() == 0:
        log.info("config:\n%s", pprint.pformat(cfg))
        log.info("devices: %s (%d processes)", jax.devices(), jax.process_count())
        with open(os.path.join(tb_log_dir, "config.json"), "w") as fh:
            json.dump(cfg, fh, indent=2)
    writer = ScalarWriter(tb_log_dir) if jax.process_index() == 0 else None

    # ---- model / resume
    mcfg = model_config(cfg)
    best_perf, begin_epoch = 0.0, cfg["begin_epoch"]
    resume_path = None
    if cfg["jit"]:
        # bootstrap from an OpenAI JIT archive / torch checkpoint
        params, inferred = import_initial_checkpoint(cfg["begin_ckpt"])
        mcfg = inferred
        log.info("=> imported torch checkpoint %s (%s)", cfg["begin_ckpt"], mcfg)
    elif cfg["begin_ckpt"] and os.path.exists(str(cfg["begin_ckpt"])):
        # Only the sidecar meta is read here (begin_epoch feeds the LR
        # schedule); the typed restore of params/opt_state happens after the
        # optimizer exists so optax NamedTuples round-trip intact.
        resume_path = str(cfg["begin_ckpt"])
        meta = load_meta(resume_path)
        best_perf = meta.get("perf", 0.0)
        # a mid-epoch (step-granular) checkpoint re-enters its own epoch at
        # the saved batch offset; an end-of-epoch one starts the next epoch
        mid_epoch_resume = bool(meta.get("mid_epoch", False))
        begin_epoch = int(meta.get("epoch", begin_epoch)) + (
            1 if cfg["is_train"] and not mid_epoch_resume else 0
        )
        params = None
        log.info("=> resuming %s (epoch %s, perf %s)", resume_path, begin_epoch, best_perf)
    elif cfg["begin_ckpt"]:
        log.error("=> cannot find checkpoint: %s", cfg["begin_ckpt"])
        sys.exit(1)
    else:
        params = init_params(jax.random.PRNGKey(cfg["seed"]), mcfg)
        log.info("=> random init (%s)", mcfg)
    if resume_path is None:
        mid_epoch_resume = False

    # ---- data
    # model-parallel process grouping BEFORE the dataset exists: when a
    # tp/pp group spans processes (model degree > local device count), the
    # group's processes hold the same batch shard and must load IDENTICAL
    # rows — the loader/label rank collapses to the group
    # (parallel/mesh.py::data_process_group)
    from clip_event_tpu.parallel.mesh import data_process_group

    data_rank, data_world = data_process_group(
        int(cfg["tp"]) * int(cfg["pp"])
    )
    if data_world != jax.process_count():
        log.info(
            "model-parallel groups span processes: data rank %d/%d "
            "(process %d/%d)", data_rank, data_world,
            jax.process_index(), jax.process_count(),
        )
    if cfg.get("image_cache"):
        from clip_event_tpu.data import cache as image_cache

        if not os.environ.get("CLIP_EVENT_IMAGE_CACHE"):
            image_cache.activate(cfg["image_cache"])
    dataset = VOADescriptionDataset(
        posneg_descriptions_json=cfg["posneg_descriptions_json"],
        image_caption_jsons=cfg["image_caption_json"],
        image_dirs=cfg["image_dir"],
        load_object=cfg["load_object"],
        object_pickles=cfg["object_pickle"],
        object_ontology_file=cfg["object_ontology_file"],
        object_detection_threshold=cfg["object_detection_threshold"],
        object_topk=cfg["object_topk"],
        max_objects=cfg["max_objects"],
        load_ie=cfg["load_ie"],
        input_entities=cfg["input_entities"],
        input_events=cfg["input_events"],
        max_entities=cfg["max_entities"],
        max_events=cfg["max_events"],
        load_sr=cfg["load_sr"],
        max_bboxes=cfg["max_bboxes"],
        contrastive_loss=cfg["constrastive_loss"],
        overbatch=cfg["constrastive_overbatch"],
        image_size=mcfg.image_resolution,
        uint8_images=cfg["device_normalize"],
        context_cap=cfg["context_cap"],
        dedupe_texts=cfg["dedupe_texts"],
        dedupe_sr_texts=cfg["dedupe_sr_texts"],
        # overflow falls back to a differently-shaped batch, which stacked-K
        # dispatch (and multi-host assembly — forced inside the dataset)
        # cannot absorb: there an overflow must raise instead
        dedupe_strict=(
            int(cfg["steps_per_dispatch"]) > 1 or int(cfg["grad_accum_steps"]) > 1
        ),
        # multi-host: labels index the GLOBAL in-batch contrast; this
        # process emits its DATA rank's block (data/labels.py) — the data
        # rank, not the process rank, so tp/pp groups spanning processes
        # load identical rows
        dist_rank=data_rank,
        dist_world=data_world,
    )
    buckets = list(cfg["length_buckets"]) if cfg["is_train"] else []
    loader = DataLoader(
        dataset,
        batch_size=cfg["batch_size"],
        shuffle=cfg["is_train"],
        seed=cfg["seed"],
        drop_last=cfg["is_train"],
        num_workers=cfg["num_workers"],
        prefetch=cfg["prefetch"],
        rank=data_rank,
        world_size=data_world,
        bucket_widths=buckets or None,
    )
    if buckets:
        import numpy as np

        # one-time BPE pass over every description (sidecar-cached, threaded
        # over the loader's worker count); also tells the user what the
        # buckets will actually buy on THIS corpus
        widths = dataset.instance_widths(num_workers=int(cfg["num_workers"]))
        caps = loader.bucket_widths
        shares = [
            float(np.mean((widths <= hi) & (widths > (caps[i - 1] if i else 0))))
            for i, hi in enumerate(caps)
        ]
        log.info(
            "length_buckets %s: instance shares %s (narrow batches run the "
            "text tower at that width — lossless)",
            caps, ["%.0f%%" % (100 * s) for s in shares],
        )
    grad_accum = max(int(cfg["grad_accum_steps"]), 1)
    if cfg["is_train"] and len(loader) < grad_accum:
        raise SystemExit(
            f"grad_accum_steps={grad_accum} > batches per epoch "
            f"({len(loader)}): every epoch would run ZERO optimizer steps"
        )
    # optimizer steps per epoch: with gradient accumulation every K loader
    # microbatches make one optimizer step (trailing partial group dropped)
    steps_per_epoch = max(len(loader) // grad_accum, 1)

    # ---- optimizer / schedule / step
    schedule = build_schedule(
        cfg["lr_scheduler"],
        cfg["lr"],
        cfg["max_epoch"],
        begin_epoch=begin_epoch,
        steps_per_epoch=1 if cfg["steps_per_epoch_schedule"] else steps_per_epoch,
        lr_steps=cfg["lr_steps"],
        lr_gamma=cfg["lr_gamma"],
        warmup_epochs=cfg["warmup_epoch"],
    )
    optimizer = build_optimizer(
        cfg["optimizer"], schedule,
        weight_decay=cfg["weight_decay"], momentum=cfg["momentum"],
        grad_clip_norm=cfg["grad_clip_norm"],
        moment_dtype=cfg["moment_dtype"],
    )
    compute_dtype = jnp.bfloat16 if cfg["compute_dtype"] == "bfloat16" else jnp.float32
    if cfg["sync_bn"] and not mcfg.is_vit:
        # batch-stats BN; global under the dp mesh = SyncBN (train.py:219-220)
        from clip_event_tpu.models.resnet import set_bn_mode

        set_bn_mode("batch")
    steps_per_dispatch = max(int(cfg["steps_per_dispatch"]), 1)
    # shared kwargs for every step-function variant; the functions themselves
    # are built AFTER state placement so ZeRO runs can pin the output state's
    # shardings (see below)
    step_kwargs = dict(
        loss_type=cfg["constrastive_loss"],
        overbatch=cfg["constrastive_overbatch"],
        alignment=cfg["alignment"],
        alignment_chunks=cfg["alignment_chunks"],
        use_pallas_ot=cfg["use_pallas_ot"],
        compute_dtype=compute_dtype,
        remat=cfg["remat"],
        multiattention=cfg["multiattention"],
        multiattention_pooling=cfg["multiattention_pooling"],
    )

    resume_step = 0
    resume_opt_state = None
    if resume_path is not None:
        params_template = jax.eval_shape(
            lambda: init_params(jax.random.PRNGKey(0), mcfg)
        )
        params, resume_opt_state, meta = restore_checkpoint(
            resume_path, params_template=params_template, optimizer=optimizer
        )
        resume_step = int(meta.get("step", 0))
        log.info("=> restored params/opt_state (step %d)", resume_step)

    tp = int(cfg["tp"])
    pp = int(cfg["pp"])
    dcn = int(cfg["dcn_dp"])
    if jax.device_count() % (dcn * tp):
        raise SystemExit(
            f"dcn_dp={dcn} x tp={tp} does not divide device count "
            f"{jax.device_count()}"
        )
    if tp > 1:
        from clip_event_tpu.parallel.sharding import make_mesh_2d, shard_params

        mesh = make_mesh_2d(tp=tp, dcn=dcn)
        log.info("mesh: %sdp=%d x tp=%d (Megatron weight sharding)",
                 f"dcn={dcn} x " if dcn > 1 else "",
                 mesh.devices.shape[-2], tp)
        if cfg["sp"]:
            from clip_event_tpu.models.layers import set_sequence_parallel

            set_sequence_parallel(mesh)
            log.info("SP: residual-stream sequence axis sharded over tp=%d "
                     "(Megatron sequence parallelism)", tp)
    elif pp > 1:
        from clip_event_tpu.models.layers import set_pipeline
        from clip_event_tpu.parallel.pipeline import make_mesh_pp

        if jax.device_count() % pp:
            raise SystemExit(
                f"pp={pp} does not divide device count {jax.device_count()}"
            )
        mesh = make_mesh_pp(pp=pp)
        set_pipeline(mesh, microbatches=int(cfg["pp_microbatches"]))
        log.info("mesh: dp=%d x pp=%d (GPipe layer sharding, M=%d)",
                 mesh.devices.shape[0], pp, int(cfg["pp_microbatches"]))
        if mesh.devices.shape[0] > 1 and cfg["use_pallas_attention"]:
            # the pipeline body goes manual over BOTH pp and dp when the
            # global batch divides dp, so the fused kernel runs on each
            # device's local shard (parallel/pipeline.py manual_dp); when
            # the batch does NOT divide dp it falls back to dp-auto with the
            # einsum path — forfeit the kernel's measured ~45% single-chip
            # win. Make whichever happens visible.
            ndp = mesh.devices.shape[0]
            if int(cfg["batch_size"]) % ndp:
                log.warning(
                    "pp=%d with dp=%d and batch_size=%d (not a multiple of "
                    "dp) forces the einsum/XLA attention path inside "
                    "pipeline stages (the fused pallas kernel needs the "
                    "batch sharded manually over dp); expect a slower step — "
                    "pick a batch divisible by %d or see configs/README.md",
                    pp, ndp, int(cfg["batch_size"]), ndp)
            else:
                log.info(
                    "pp=%d x dp=%d: pipeline stages run manual over both "
                    "axes — the fused pallas attention kernel stays active "
                    "on each device's local batch shard", pp, ndp)
    else:
        mesh = make_mesh(dcn=dcn)
        if dcn > 1:
            log.info("mesh: dcn=%d x dp=%d (hierarchical DCN/ICI reduction)",
                     dcn, mesh.devices.shape[-1])
    if cfg["dedupe_texts"] or cfg["dedupe_sr_texts"]:
        from clip_event_tpu.parallel.mesh import data_size

        ndp = data_size(mesh)
        for key in ("dedupe_texts", "dedupe_sr_texts"):
            if cfg[key]:
                if cfg[key] % ndp:
                    log.warning(
                        "%s=%d does not divide the data-parallel degree %d: "
                        "the unique token rows will be REPLICATED (every "
                        "device encodes all of them) — pick a multiple of %d "
                        "to shard the unique encode too",
                        key, cfg[key], ndp, ndp,
                    )
                else:
                    log.info("%s=%d: unique rows shard over dp=%d",
                             key, cfg[key], ndp)
    if cfg["use_pallas_attention"]:
        # set BEFORE the first step trace; the mesh lets the kernel shard_map
        # over dp on multi-chip meshes (GSPMD can't partition a custom call);
        # under tp>1 it runs head-group-parallel (einsum fallback for
        # non-conforming shapes)
        from clip_event_tpu.models.layers import set_attention_impl

        set_attention_impl("pallas", mesh)
    if cfg.get("use_pallas_ln", False):
        from clip_event_tpu.models.layers import set_ln_impl

        set_ln_impl("pallas", mesh)
    if tp > 1:
        # column/row-sharded transformer weights; optax moments inherit the
        # param shardings through optimizer.init
        state = create_train_state(shard_params(params, mesh), optimizer)
    elif pp > 1:
        # layer-sharded transformer stacks; moments inherit through init
        from clip_event_tpu.parallel.pipeline import shard_params_pp

        state = create_train_state(shard_params_pp(params, mesh), optimizer)
    else:
        state = create_train_state(replicate(params, mesh), optimizer)
        state = state._replace(opt_state=replicate(state.opt_state, mesh))
    if resume_opt_state is not None:
        if tp > 1 or pp > 1:
            import numpy as np
            from jax.sharding import NamedSharding, PartitionSpec as P

            # re-shard restored (canonical, host) moments to the template's
            # tp layout; scalar leaves (step counts) replicate
            def _place(t, x):
                s = getattr(t, "sharding", None)
                if not (isinstance(s, NamedSharding) and s.mesh == mesh):
                    s = NamedSharding(mesh, P())
                return jax.device_put(np.asarray(x), s)

            resume_opt_state = jax.tree.map(
                _place, state.opt_state, resume_opt_state
            )
            state = state._replace(
                opt_state=resume_opt_state,
                step=jnp.asarray(resume_step, jnp.int32),
            )
        else:
            state = state._replace(
                opt_state=replicate(resume_opt_state, mesh),
                step=jnp.asarray(resume_step, jnp.int32),
            )
    del params

    state_shardings = None
    if cfg["zero"] or cfg["fsdp"]:
        from clip_event_tpu.parallel.mesh import DATA_AXIS
        from clip_event_tpu.parallel.sharding import (
            shard_opt_state_zero,
            shard_params_fsdp,
        )

        if dict(mesh.shape).get(DATA_AXIS, 1) > 1:
            # ZeRO: re-place the state dp-sharded (fresh or restored — this
            # runs after any resume placement) and pin the step output's
            # layout so the sharding survives across steps. fsdp (ZeRO-3)
            # shards the params too and implies sharded moments; zero alone
            # (ZeRO-1) shards only the moments.
            if cfg["fsdp"]:
                state = state._replace(
                    params=shard_params_fsdp(state.params, mesh)
                )
                log.info("FSDP: params sharded over dp=%d",
                         dict(mesh.shape)[DATA_AXIS])
            state = state._replace(
                opt_state=shard_opt_state_zero(state.opt_state, mesh)
            )
            state_shardings = jax.tree.map(lambda x: x.sharding, state)
            log.info("ZeRO-1: optimizer moments sharded over dp=%d",
                     dict(mesh.shape)[DATA_AXIS])
        else:
            log.info("ZeRO/FSDP requested but dp=1 — state stays replicated")

    if steps_per_dispatch > 1:
        # K steps fused into one device dispatch (lax.scan over a stacked
        # batch) — amortizes host dispatch latency for small per-step times
        multi_step, _ = make_multi_step(
            mcfg, optimizer, steps_per_dispatch,
            state_shardings=state_shardings, **step_kwargs,
        )
        train_step = accum_step = None
    elif grad_accum > 1:
        # K loader microbatches → ONE optimizer step; microbatch activations
        # are freed between scan iterations, so the memory envelope is the
        # single-microbatch step's
        accum_step = make_accum_step(
            mcfg, optimizer, grad_accum,
            state_shardings=state_shardings, **step_kwargs,
        )
        multi_step = train_step = None
    else:
        multi_step = accum_step = None
        train_step = make_train_step(
            mcfg, optimizer, state_shardings=state_shardings, **step_kwargs,
        )

    # ---- epoch loop
    global_step = resume_step
    resume_in_epoch = 0
    if mid_epoch_resume and cfg["is_train"]:
        # optimizer steps per epoch are uniform (drop_last=True), so the
        # in-epoch offset follows from the global step; the loader offset is
        # grad_accum microbatches per optimizer step. Requires the resumed
        # run to keep batch_size/world_size/grad_accum (steps_per_epoch)
        # fixed.
        resume_in_epoch = min(
            max(resume_step - begin_epoch * steps_per_epoch, 0), steps_per_epoch
        )
        if resume_in_epoch:
            log.info(
                "=> mid-epoch resume: epoch %d restarts at batch %d/%d",
                begin_epoch, resume_in_epoch, steps_per_epoch,
            )
    save_steps = max(int(cfg["save_steps"]), 0)
    max_steps = max(int(cfg["max_steps"]), 0)
    next_save = ((global_step // save_steps) + 1) * save_steps if save_steps else None
    stop_training = False

    # Preemption handling: TPU maintenance events deliver SIGTERM (to every
    # host of a slice) with a grace window. The handler only sets a flag —
    # the save happens at the next optimizer-step boundary in step_hooks,
    # because the checkpoint write is COLLECTIVE under jax.distributed
    # (engine/checkpoint.py) and must be entered by all processes at the
    # same step. Resume re-enters the epoch at the saved batch offset (the
    # mid_epoch path above). The reference has no counterpart (its recovery
    # model is crash-and-restart from the last epoch, SURVEY §5).
    preempted = {"flag": False}
    if cfg["is_train"]:
        import signal

        def _on_sigterm(signum, frame):
            preempted["flag"] = True
            log.warning(
                "=> SIGTERM: checkpointing at the next step boundary, then exiting"
            )

        signal.signal(signal.SIGTERM, _on_sigterm)
    for epoch in range(begin_epoch, cfg["max_epoch"]):
        log.info("=> Epoch[%d]: train start", epoch)
        loader.set_epoch(
            epoch,
            start_batch=resume_in_epoch * grad_accum if epoch == begin_epoch else 0,
        )
        metric_logger = MetricLogger()
        start = time.time()
        profiling = args.profile_dir and epoch == begin_epoch and jax.process_index() == 0
        if profiling:
            jax.profiler.start_trace(args.profile_dir)
        # Metrics stay on-device between prints: materializing them every
        # step would force a host sync per step (the reference's
        # cuda.synchronize pattern, engine.py:99); here up to print_freq
        # steps stay in flight.
        pending = []
        # which samples were in flight, per recent step — the batch itself is
        # too big to buffer on the host, but the image ids are enough to
        # re-assemble the offending batch offline (the loader is
        # deterministic). Dumped beside the checkpoints on a NaN abort.
        import collections

        recent_meta = collections.deque(maxlen=max(cfg["print_freq"], 1) + 2)

        def drain():
            nonlocal pending
            for step_idx, m in pending:
                if not bool(m["finite"]):
                    log.error("Loss is not finite, stopping training")
                    log.error({k: float(v) for k, v in m.items()})
                    debug = {
                        "epoch": epoch,
                        "global_step": step_idx,
                        "metrics": {k: float(v) for k, v in m.items()},
                        "recent_batches": [
                            {"global_step": s, "image_ids": ids}
                            for s, ids in recent_meta
                        ],
                    }
                    path = os.path.join(
                        ckpt_dir, task,
                        f"nan_debug_step{step_idx}_rank{jax.process_index()}.json",
                    )
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    with open(path, "w") as fh:
                        json.dump(debug, fh, indent=1)
                    log.error("NaN debug artifact written to %s", path)
                    sys.exit(1)
                scalars = {k: float(v) for k, v in m.items() if k != "finite"}
                scalars["lr"] = float(schedule(step_idx))
                metric_logger.update(**scalars)
            pending = []

        def step_hooks() -> bool:
            """save_steps / max_steps / preemption checks; True = stop."""
            nonlocal next_save, stop_training
            hit_max = bool(max_steps) and global_step >= max_steps
            hit_term = preempted["flag"]
            if (next_save is not None and global_step >= next_save) or hit_max or hit_term:
                drain()
                save_checkpoint(
                    ckpt_dir, task, epoch, state.params, state.opt_state,
                    best_perf, step=global_step, mid_epoch=True,
                    # a preempting scheduler may not honor the grace window —
                    # write synchronously so the ckpt is durable before exit
                    async_save=cfg["async_save"] and not hit_term,
                )
                log.info("=> step checkpoint at global step %d", global_step)
                if next_save is not None:
                    while next_save <= global_step:
                        next_save += save_steps
            if hit_max:
                log.info("=> max_steps=%d reached, stopping", max_steps)
                stop_training = True
            if hit_term:
                log.warning("=> preemption checkpoint written, stopping")
                stop_training = True
            return stop_training

        def run_buffered(group, dispatch):
            """Buffer `group` loader batches, stack, dispatch; `dispatch`
            returns the list of (optimizer-step) metrics dicts the stack
            produced. Shared by the K-steps-fused and grad-accum modes."""
            nonlocal state, global_step
            import jax.numpy as _jnp

            buffer = []
            for batch, _meta in metric_logger.log_every(
                device_prefetch(loader, mesh, depth=cfg["prefetch"]),
                cfg["print_freq"],
                header=f"Epoch: [{epoch}]",
            ):
                recent_meta.append(
                    (global_step + len(buffer),
                     [mm.get("image_id") for mm in _meta])
                )
                buffer.append(batch)
                if len(buffer) == group:
                    stacked = {
                        k: _jnp.stack([b[k] for b in buffer]) for k in buffer[0]
                    }
                    buffer = []
                    for m in dispatch(stacked):
                        pending.append((global_step, m))
                        global_step += 1
                    if len(pending) >= max(cfg["print_freq"], 1):
                        drain()
                    if step_hooks():
                        break
            drain()

        if steps_per_dispatch > 1:
            # same step function as single-dispatch: full metrics dict per
            # fused step, each leaf stacked [K]
            def dispatch_fused(stacked):
                nonlocal state
                state, metrics_k = multi_step(state, stacked)
                return [
                    {k: v[j] for k, v in metrics_k.items()}
                    for j in range(steps_per_dispatch)
                ]

            run_buffered(steps_per_dispatch, dispatch_fused)
        elif grad_accum > 1:
            # K microbatches, ONE optimizer step, one metrics dict
            def dispatch_accum(stacked):
                nonlocal state
                state, metrics = accum_step(state, stacked)
                return [metrics]

            run_buffered(grad_accum, dispatch_accum)
        else:
            for batch, _meta in metric_logger.log_every(
                device_prefetch(loader, mesh, depth=cfg["prefetch"]),
                cfg["print_freq"],
                header=f"Epoch: [{epoch}]",
            ):
                recent_meta.append(
                    (global_step, [mm.get("image_id") for mm in _meta])
                )
                state, metrics = train_step(state, batch)
                pending.append((global_step, metrics))
                global_step += 1
                if len(pending) >= max(cfg["print_freq"], 1):
                    drain()
                if step_hooks():
                    break
            drain()
        if profiling:
            jax.profiler.stop_trace()
        # host-side meters (iter/data time) diverge per process; sync their
        # global stats before logging (reference utils.py:36-47)
        metric_logger.synchronize_between_processes()
        log.info("=> Epoch[%d]: train end, duration: %.2fs", epoch, time.time() - start)
        if stop_training:
            # mid-epoch stop: the step checkpoint was already written by
            # step_hooks; skip the end-of-epoch save/validation
            break

        if writer is not None:
            writer.add_scalar("train_loss", metric_logger.loss.global_avg, epoch)
            # per-branch loss components (loss_i/loss_t/loss_ot/loss_bbox/…):
            # epoch means, so every enabled branch is visible in the scalar
            # stream (the reference logs only the total, engine.py:106-110)
            for name, meter in metric_logger.meters.items():
                if name.startswith("loss_"):
                    writer.add_scalar(name, meter.global_avg, epoch)

        # optional validation: zero-shot image-caption matching (tracks perf,
        # realizing the reference's unimplemented "evaluate after every
        # epoch" hook + its `perf` checkpoint field, train.py:244-248)
        if (
            cfg["validate_every"]
            and (epoch + 1) % cfg["validate_every"] == 0
            and cfg["val_image_caption_json"]
        ):
            from clip_event_tpu.data.voa import VOACaptionDataset
            from clip_event_tpu.evals.matching import evaluate_matching

            val_ds = VOACaptionDataset(
                cfg["val_image_caption_json"], cfg["val_image_dir"],
                image_size=mcfg.image_resolution,
            )
            val = evaluate_matching(state.params, mcfg, val_ds,
                                    batch_size=cfg["batch_size"])
            best_perf = max(best_perf, val["i2t_top1"])
            log.info("=> Epoch[%d] validation: %s (best %.4f)", epoch, val, best_perf)
            if writer is not None:
                writer.add_scalar("val_i2t_top1", val["i2t_top1"], epoch)

        save_checkpoint(
            ckpt_dir, task, epoch, state.params, state.opt_state, best_perf,
            step=int(state.step), async_save=cfg["async_save"],
        )

    if writer is not None:
        writer.close()
    # async_save: the last write must commit before the process exits
    from clip_event_tpu.engine.checkpoint import wait_for_saves

    wait_for_saves()
    if jax.process_count() > 1:
        # align ranks before interpreter teardown: the coordination-service
        # shutdown barrier has a short timeout, and checkpoint-commit skew
        # (async saves finalize rank-0-first) can otherwise trip it on
        # loaded hosts — observed as 'Shutdown barrier timed out, 3/4
        # tasks' with every rank's work actually complete
        from clip_event_tpu.parallel.collectives import comm

        comm.synchronize()


if __name__ == "__main__":
    main()
