"""Worker for tests/test_multihost.py: one JAX process of a 2-process CPU
cluster. Validates the multi-process branch of ``parallel/mesh.py::
shard_batch`` (``make_array_from_process_local_data``,  mesh.py:79-84) and
the per-host loader sharding semantics (``data/imagenet.py``): block shard
for train (DistributedSampler-equivalent), ``indices[host::num_hosts]``
stride for val (reference ``data/samplers.py:11-29``).

Usage: multihost_worker.py <coordinator_addr> <process_id> <num_processes>
Prints "WORKER<rank> OK" on success; any assertion exits non-zero.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


class ToyDataset:
    """dataset[i] -> (image filled with i, label i); length 10 (odd per-host
    val shard sizes: host0 strides 5, host1 strides 5 of 10 -> both 5; use
    length 9 for the ragged case)."""

    def __init__(self, n=9, img=4):
        self.n, self.img = n, img

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (
            np.full((self.img, self.img, 3), float(i), np.float32),
            np.int32(i),
        )


def main() -> int:
    addr, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    # force CPU through jax.config as well: the ambient sitecustomize
    # registers an accelerator plugin that ignores the env var (same
    # reasoning as tests/conftest.py), and this worker must never touch
    # the real chip. gloo is the CPU cross-process collectives impl.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=nprocs, process_id=pid
    )
    import jax.numpy as jnp

    from ml_autofocusformermod_tpu.data.imagenet import Loader
    from ml_autofocusformermod_tpu.parallel import mesh as pmesh

    assert jax.process_count() == nprocs
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 2 * nprocs

    mesh = pmesh.make_mesh(data=-1)

    # --- train loader: block shard, global batch = concat of host batches
    ds = ToyDataset(n=8)
    train = Loader(
        ds, batch_size=4, shuffle=False, host=pid, num_hosts=nprocs,
        drop_last=True,
    )
    assert len(train) == 1
    (batch,) = list(train)
    # block shard of arange(8): host0 -> 0..3, host1 -> 4..7
    np.testing.assert_array_equal(
        batch["label"], np.arange(4) + 4 * pid
    )

    sharded = pmesh.shard_batch(mesh, batch)
    labels = sharded["label"]
    assert labels.shape == (8,), f"global batch shape {labels.shape}"

    # position-weighted sum pins the concat ORDER (host0 rows first), not
    # just the membership
    @jax.jit
    def posw(l):
        return (l * (jnp.arange(l.shape[0]) + 1)).sum()

    expect = (np.arange(8) * (np.arange(8) + 1)).sum()
    got = int(posw(labels))
    assert got == expect, f"global assembly order wrong: {got} != {expect}"

    # image rows must line up with their labels host-by-host
    @jax.jit
    def img_label_gap(img, l):
        return jnp.abs(img.mean((1, 2, 3)) - l).max()

    # fp32 mean of 48 identical values rounds at ~1e-7; exact zero is not
    # guaranteed across reduction orders
    assert float(img_label_gap(sharded["image"], labels * 1.0)) < 1e-5

    # --- val loader: stride shard with -1 padding, equal batch counts
    vds = ToyDataset(n=9)
    val = Loader(
        vds, batch_size=5, shuffle=False, host=pid, num_hosts=nprocs,
        drop_last=False, stride_shard=True,
    )
    vbatches = list(val)
    assert len(vbatches) == 1  # both hosts: ceil(9/2)=5 rows -> one batch
    vb = vbatches[0]
    # _pack omits "valid" for all-valid batches; normalize (every process
    # must shard the same tree structure — a missing key would deadlock)
    vb = {**vb, "valid": vb.get("valid", np.ones(5, bool))}
    if pid == 0:
        np.testing.assert_array_equal(vb["label"], [0, 2, 4, 6, 8])
        np.testing.assert_array_equal(vb["valid"], [1, 1, 1, 1, 1])
    else:
        # host1 strides [1,3,5,7] then pads with index 0, valid=False
        np.testing.assert_array_equal(vb["label"], [1, 3, 5, 7, 0])
        np.testing.assert_array_equal(vb["valid"], [1, 1, 1, 1, 0])

    # per-host batches of 5 give a global batch of 10 — not divisible by
    # the 4-device data axis; pad each host's batch to a fixed row count
    # exactly like main.py's validate does (trainer.pad_batch_to_size)
    from ml_autofocusformermod_tpu.train import trainer

    vb = trainer.pad_batch_to_size(vb, 8)
    np.testing.assert_array_equal(vb["valid"][5:], [0, 0, 0])
    vsharded = pmesh.shard_batch(mesh, vb)

    @jax.jit
    def masked_sum(l, v):
        return (l * v).sum(), v.sum()

    s, c = masked_sum(vsharded["label"], vsharded["valid"])
    assert int(c) == 9, f"valid count {int(c)}"
    assert int(s) == sum(range(9)), f"masked label sum {int(s)}"

    print(f"WORKER{pid} OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
