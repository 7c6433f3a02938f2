"""Train / evaluate / benchmark CLI — same surface as the reference
``main.py:38-66``:

    python main.py --cfg <yaml> [--eval] [--throughput] [--resume ckpt]
        [--batch-size N] [--epochs N] [--blr LR] [--data-path P]
        [--accumulation-steps N] [--output DIR] [--tag T]
        [--opts KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time

import numpy as np


def parse_option():
    parser = argparse.ArgumentParser(
        "AutoFocusFormer (TPU) training and evaluation script",
        add_help=False,
    )
    parser.add_argument("--cfg", type=str, required=True, metavar="FILE",
                        help="path to config file")
    parser.add_argument("--opts", nargs="+", default=None,
                        help="Modify config options via 'KEY VALUE' pairs")
    parser.add_argument("--batch-size", type=int, help="batch size per host")
    parser.add_argument("--data-path", type=str, help="path to dataset")
    parser.add_argument("--resume", type=str, help="checkpoint to resume from")
    parser.add_argument("--accumulation-steps", type=int,
                        help="gradient accumulation steps")
    parser.add_argument("--output", default="output", type=str, metavar="PATH")
    parser.add_argument("--tag", type=str, help="tag of experiment")
    parser.add_argument("--eval", action="store_true",
                        help="Perform evaluation only")
    parser.add_argument("--throughput", action="store_true",
                        help="Test throughput only")
    parser.add_argument("--blr", type=float, help="base learning rate")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of a few train "
                             "steps into DIR (XProf/TensorBoard format)")
    parser.add_argument("--epochs", type=int, help="epochs")
    parser.add_argument("--local_rank", type=int, default=0)
    args, _ = parser.parse_known_args()
    return args


def run_all():
    import jax

    # honour JAX_PLATFORMS explicitly: an environment sitecustomize may
    # force-register an accelerator plugin that outranks the env var, and
    # `JAX_PLATFORMS=cpu python main.py` (tests, CI) must actually run on
    # CPU rather than silently grabbing the accelerator
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # persistent compile cache (first full-model compile through the
    # remote-compile path takes minutes; reruns are instant)
    from ml_autofocusformermod_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    args = parse_option()

    # multi-host init (no-op single-host; replaces NCCL init_process_group,
    # reference utils.py:134-146)
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    host = jax.process_index()
    num_hosts = jax.process_count()

    from ml_autofocusformermod_tpu.config import get_config

    config = get_config(args)

    # linear LR scaling over the GLOBAL batch (reference main.py:437-449)
    from ml_autofocusformermod_tpu.train.optim import scale_base_lr

    world_batch = config.DATA.BATCH_SIZE * num_hosts
    config.defrost()
    scale_base_lr(config, world_batch)
    config.freeze()

    os.makedirs(config.OUTPUT, exist_ok=True)
    from ml_autofocusformermod_tpu.utils.logger import create_logger

    logger = create_logger(config.OUTPUT, dist_rank=host,
                           name=config.MODEL.NAME)
    if host == 0:
        path = os.path.join(config.OUTPUT, "config.json")
        with open(path, "w") as f:
            json.dump(config.to_dict(), f, indent=2)
        logger.info(f"Full config saved to {path}")

    main(config, logger, host, num_hosts)


def main(config, logger, host, num_hosts):
    import jax
    import jax.numpy as jnp

    from ml_autofocusformermod_tpu.ckpt import orbax_io, pth_import
    from ml_autofocusformermod_tpu.data.imagenet import build_loaders
    from ml_autofocusformermod_tpu.models.build import build_model
    from ml_autofocusformermod_tpu.parallel import mesh as pmesh
    from ml_autofocusformermod_tpu.train import trainer as T
    from ml_autofocusformermod_tpu.utils.meters import AverageMeter
    from ml_autofocusformermod_tpu.utils.metrics_log import MetricsLogger

    train_loader, val_loader, num_classes = build_loaders(
        config, host=host, num_hosts=num_hosts
    )
    if num_classes != config.MODEL.NUM_CLASSES:
        config.defrost()
        config.MODEL.NUM_CLASSES = num_classes
        config.freeze()

    model = build_model(config)
    img = config.DATA.IMG_SIZE
    rng = jax.random.PRNGKey(config.SEED)
    rng, init_rng = jax.random.split(rng)

    n_steps = max(len(train_loader), 1)
    state, tx, schedule = T.create_train_state(
        config, model, init_rng, jnp.zeros((1, img, img, 3)), n_steps
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
    )
    logger.info(f"number of params: {n_params}")
    if config.PRINT_FLOPS:
        # ptflops-equivalent MACs report (reference main.py:108-111), from
        # XLA's cost analysis of the program that actually runs
        from ml_autofocusformermod_tpu.utils.flops import model_complexity

        try:
            cost = model_complexity(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                img,
            )
            logger.info(
                f"number of GFLOPs: {cost['flops'] / 1e9:.2f} "
                f"(XLA cost analysis, fwd per image)"
            )
            if cost["peak_bytes"] == cost["peak_bytes"]:  # not NaN
                logger.info(
                    f"compiled fwd peak device memory: "
                    f"{cost['peak_bytes'] / 2**20:.1f} MiB"
                )
        except Exception as e:  # cost analysis is best-effort on some backends
            logger.warning(f"FLOPs estimate unavailable: {e}")

    mesh = pmesh.make_mesh(
        data=config.TPU.MESH_DATA, model=config.TPU.MESH_MODEL,
        seq=config.TPU.MESH_SEQ,
    )
    if config.DATA.BATCH_SIZE % int(np.prod(mesh.devices.shape)) != 0:
        raise ValueError(
            f"DATA.BATCH_SIZE={config.DATA.BATCH_SIZE} must be divisible by "
            f"the device count {int(np.prod(mesh.devices.shape))}"
        )

    # optional pretrained / resume
    if config.MODEL.AFF.PRETRAINED or config.MODEL.PRETRAINED:
        path = config.MODEL.AFF.PRETRAINED or config.MODEL.PRETRAINED
        sd = pth_import.load_pth_state_dict(path)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables, missing, unexpected = pth_import.import_torch_state_dict(
            variables, sd
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        logger.info(
            f"loaded pretrained {path}: {len(missing)} missing, "
            f"{len(unexpected)} unexpected"
        )

    start_epoch = config.TRAIN.START_EPOCH
    max_accuracy = 0.0
    resume = config.MODEL.RESUME
    if not resume and config.TRAIN.AUTO_RESUME:
        resume = orbax_io.auto_resume_helper(config.OUTPUT)
    if resume:
        if resume.endswith(".pth"):
            sd = pth_import.load_pth_state_dict(resume)
            variables = {
                "params": state.params, "batch_stats": state.batch_stats
            }
            variables, missing, unexpected = pth_import.import_torch_state_dict(
                variables, sd
            )
            state = state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
            )
            logger.info(
                f"=> loaded torch checkpoint {resume} "
                f"({len(missing)} missing / {len(unexpected)} unexpected)"
            )
        else:
            state, epoch, max_accuracy, rng = orbax_io.load_checkpoint(
                resume, state
            )
            start_epoch = epoch + 1
            logger.info(f"=> resumed from {resume} (epoch {epoch})")

    # lay out the tensor-parallel layout over the mesh `model` axis
    # (pure replication when TPU.MESH_MODEL == 1); optimizer moments and
    # EMA shard along with the params (parallel/tp.py). TPU.ZERO1
    # additionally shards moments/EMA over `data` (parallel/zero.py).
    if config.TPU.ZERO1:
        from ml_autofocusformermod_tpu.parallel import zero as pzero

        state = pzero.shard_tree(mesh, state)
    else:
        from ml_autofocusformermod_tpu.parallel import tp as ptp

        state = ptp.shard_tree(mesh, state)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # test model throughput: the reference ALWAYS benchmarks before
    # training or eval, not only in --throughput mode (main.py:113-118)
    batch = next(iter(val_loader))
    fps = T.throughput(model, variables, jnp.asarray(batch["image"]))
    logger.info(f"throughput averaged with 30 times: {fps:.1f} img/s")
    if config.THROUGHPUT_MODE:
        return

    eval_step = jax.jit(T.make_eval_step(config, model))

    n_mesh = int(np.prod(mesh.devices.shape))

    from ml_autofocusformermod_tpu.data.prefetch import prefetch_to_mesh

    def validate(variables):
        meters = {k: AverageMeter() for k in ("loss", "top1", "top5")}
        # pad every batch to ONE fixed shape (first batch is a full one,
        # rounded up to the mesh multiple) -> a single eval executable
        eval_rows = [None]

        def pad(batch):
            if eval_rows[0] is None:
                eval_rows[0] = -(-batch["label"].shape[0] // n_mesh) * n_mesh
            return T.pad_batch_to_size(batch, eval_rows[0])

        for sharded in prefetch_to_mesh(val_loader, mesh, transform=pad):
            with mesh:
                out = eval_step(
                    variables["params"], variables["batch_stats"], sharded
                )
            n = int(out["count"])
            if n == 0:  # batch was pure cross-host padding
                continue
            meters["loss"].update(float(out["loss_sum"]) / n, n)
            meters["top1"].update(float(out["top1"]) / n * 100, n)
            meters["top5"].update(float(out["top5"]) / n * 100, n)
        return (
            meters["top1"].avg, meters["top5"].avg, meters["loss"].avg
        )

    if config.EVAL_MODE:
        acc1, acc5, loss = validate(variables)
        logger.info(
            f"Accuracy of the network: {acc1:.1f}% top-1, {acc5:.1f}% top-5"
        )
        return

    # training
    from ml_autofocusformermod_tpu.train import curriculum

    metrics_log = MetricsLogger(
        config.OUTPUT, project="CandidateNet", name=config.MODEL.NAME,
        config=config.to_dict(), enabled=host == 0,
    )

    # donate the TrainState: the step's output state reuses its buffers
    # in place (halves peak optimizer/param HBM during the update)
    train_step = jax.jit(
        T.make_train_step(config, model, tx, schedule), donate_argnums=(0,)
    )

    from ml_autofocusformermod_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler(
        config.PROFILE, start=config.PROFILE_START, count=config.PROFILE_STEPS
    )
    if config.PROFILE and host == 0:
        logger.info(
            f"profiler: tracing steps [{config.PROFILE_START}, "
            f"{config.PROFILE_START + config.PROFILE_STEPS}) to {config.PROFILE}"
        )

    logger.info("Start training")
    start = time.time()
    prev_ratios = None
    for epoch in range(start_epoch, config.TRAIN.EPOCHS):
        # upsampling-ratio curriculum: anneal 1.0 -> final over training
        # (reference main.py:231-235; guarded + quantized here — the
        # reference version crashes for MODEL.TYPE=aff)
        if curriculum.applies_to(model):
            if prev_ratios is None:
                final_ratios = list(model.final_upsampling_ratios)
            ratios = curriculum.epoch_upsample_ratios(
                final_ratios, config.TRAIN.EPOCHS, epoch
            )
            if ratios != prev_ratios:
                logger.info(f"Upsampling ratios now {ratios}")
                model = build_model(config, upscale_ratios=ratios)
                train_step = jax.jit(
                    T.make_train_step(config, model, tx, schedule),
                    donate_argnums=(0,),
                )
                # the reference mutates ONE shared model, so validation also
                # sees the current epoch's ratios — rebuild eval to match
                eval_step = jax.jit(T.make_eval_step(config, model))
                prev_ratios = ratios
        train_loader.set_epoch(epoch)
        meters = {k: AverageMeter() for k in ("loss", "grad_norm")}
        t0 = time.time()
        # every-step meters (reference main.py:290-312) WITHOUT a per-step
        # device sync: stash the device scalars and drain them at print
        # time, when the producing steps have long since finished
        pending = []

        def drain():
            for pidx, ploss, pgn, pfin in pending:
                meters["loss"].update(float(ploss))
                meters["grad_norm"].update(float(pgn))
                if not bool(pfin):
                    logger.warning(f"non-finite gradients at step {pidx}")
            pending.clear()

        # host decode/augment + H2D run `size` steps ahead on a thread
        # (data/prefetch.py), so neither sits between two step dispatches
        for idx, sharded in enumerate(prefetch_to_mesh(train_loader, mesh)):
            profiler.step(int(state.step))
            with mesh:
                state, metrics = train_step(state, sharded, rng)
            pending.append((idx, metrics["loss"], metrics["grad_norm"],
                            metrics["grads_finite"]))
            if idx % config.PRINT_FREQ == 0:
                drain()
                lr = float(metrics["lr"])
                logger.info(
                    f"Train: [{epoch}/{config.TRAIN.EPOCHS}][{idx}/"
                    f"{len(train_loader)}] lr {lr:.6f} "
                    f"loss {meters['loss'].val:.4f} ({meters['loss'].avg:.4f}) "
                    f"grad_norm {meters['grad_norm'].val:.4f}"
                )
                metrics_log.log(
                    {"train/loss": meters["loss"].val,
                     "train/grad_norm": meters["grad_norm"].val,
                     "train/lr": lr},
                    step=int(state.step),
                )
        drain()
        logger.info(
            f"EPOCH {epoch} training takes "
            f"{datetime.timedelta(seconds=int(time.time() - t0))}"
        )
        # collective: orbax save must run on EVERY process (each writes its
        # addressable shards); gating on host 0 would deadlock multi-host
        if (
            epoch % config.SAVE_FREQ == 0 or epoch == config.TRAIN.EPOCHS - 1
        ):
            orbax_io.save_checkpoint(
                config.OUTPUT, epoch, state, max_accuracy, rng,
                keep_every=config.SAVE_FREQ,
            )
        if epoch % config.EVAL_FREQ == 0 or epoch == config.TRAIN.EPOCHS - 1:
            variables = {
                "params": state.params, "batch_stats": state.batch_stats
            }
            acc1, acc5, loss = validate(variables)
            max_accuracy = max(max_accuracy, acc1)
            logger.info(
                f"Accuracy: {acc1:.2f}% top-1 / {acc5:.2f}% top-5 "
                f"(max {max_accuracy:.2f}%)"
            )
            metrics_log.log(
                {"val/acc1": acc1, "val/acc5": acc5, "val/loss": loss,
                 "epoch": epoch},
                step=int(state.step),
            )
            if state.ema_params is not None:
                ema_vars = {
                    "params": state.ema_params,
                    "batch_stats": state.ema_batch_stats,
                }
                e1, e5, _ = validate(ema_vars)
                logger.info(f"EMA Accuracy: {e1:.2f}% / {e5:.2f}%")

    profiler.stop()
    orbax_io.wait_for_checkpoints()  # flush the async save before exit
    total = time.time() - start
    logger.info(
        f"Training time {datetime.timedelta(seconds=int(total))}"
    )


if __name__ == "__main__":
    run_all()
