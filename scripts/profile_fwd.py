"""Capture a jax.profiler trace of a model forward (or train step) on the
real chip and print the top HLO ops by self time.

Usage: python scripts/profile_fwd.py [mini_fwd|mini_train|small_fwd] [outdir]

Parses the raw .xplane.pb directly (XEvent durations per op on the TPU
device plane) so no TensorBoard UI is needed.
"""

import glob
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128


def _xplane_pb2():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    return xplane_pb2


def summarize(logdir: str, top: int = 40) -> None:
    xplane_pb2 = _xplane_pb2()
    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    ))
    if not paths:
        print(f"no xplane.pb under {logdir}")
        return
    path = paths[-1]
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        print(f"\n=== plane: {plane.name} ===")
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                continue
            tot = defaultdict(int)
            cnt = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps
                cnt[name] += 1
            if not tot:
                continue
            total_ps = sum(tot.values())
            print(f"-- line: {line.name} (total {total_ps/1e9:.3f} ms)")
            for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                print(
                    f"  {ps/1e9:9.3f} ms  {100*ps/total_ps:5.1f}%  "
                    f"x{cnt[name]:<5d} {name[:110]}"
                )


def run_and_trace(mode: str, logdir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.bench_common import host_init
    from scripts.bench_train import _build

    if mode in ("mini_fwd", "small_fwd"):
        _, model = _build("mini" if mode == "mini_fwd" else "small")
        images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
        variables = host_init(
            model, jax.random.PRNGKey(0), images[:1], training=False
        )
        fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
        float(fwd(variables, images).sum())  # compile+warm
        float(fwd(variables, images).sum())
        with jax.profiler.trace(logdir):
            for i in range(3):
                out = fwd(variables, images + jnp.float32(i) * 1e-6)
                float(out.sum())
    elif mode == "mini_train":
        from ml_autofocusformermod_tpu.config import load_config
        from ml_autofocusformermod_tpu.train import trainer

        cfg = load_config(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ml_autofocusformermod_tpu", "configs", "aff_mini.yaml",
        ))
        _, model = _build("mini")
        images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 224, 224, 3))
        labels = jnp.arange(BATCH) % 1000
        variables = host_init(
            model, jax.random.PRNGKey(0), images[:1], training=False
        )
        state, tx, schedule = trainer.create_train_state(
            cfg, model, jax.random.PRNGKey(0), images[:1], 1000,
            variables=variables,
        )
        step = jax.jit(trainer.make_train_step(cfg, model, tx, schedule))
        batch = {"image": images, "label": labels}
        state, m = step(state, batch, jax.random.PRNGKey(0))
        float(m["loss"])
        with jax.profiler.trace(logdir):
            for i in range(3):
                state, m = step(state, batch, jax.random.PRNGKey(i + 1))
                float(m["loss"])
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "mini_fwd"
    logdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/prof_{mode}"
    if mode == "summarize":
        summarize(logdir)
    else:
        run_and_trace(mode, logdir)
        summarize(logdir)
