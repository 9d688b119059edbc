"""Isolate the host-RSS growth seen during the round-5 endurance soak.

The soak (scripts/soak.py) surfaced ~monotonic host RSS growth tracking the
decoded-batch volume (~6 GB/epoch at batch 512 / 256px). This probe
bisects it to the environment's remote-TPU (axon tunnel) client:

  * the production BatchLoader alone (no JAX): FLAT RSS over 21k images;
  * ANY host->device transfer path (device_put, donated device_put,
    make_array_from_process_local_data, explicit .delete()): leaks
    ~100% of the transferred bytes — ~100 MB retained per 100 MB batch;
  * on-device compute with NO host transfer: ~0.3 MB/step (flat).

So the leak is per-transfer host-buffer retention inside the tunnel
client, outside this repo's code. Operational envelope on this host
(125 GB RAM, ~30 MB/s leak at soak throughput): a single trainer process
survives ~3.5 h; the soak runs in sub-hour segments with SIGTERM
checkpoint + exact resume between them — which the trainer supports by
design, and which doubles as restart-robustness evidence. On a real TPU
VM (local PCIe transfers, no tunnel) this pathway does not exist.

  python scripts/probe_axon_transfer_leak.py
"""

from __future__ import annotations

import resource

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def probe(name: str, fn, n: int = 20, mb_per_call: float = 100.0) -> None:
    r0 = rss_mb()
    for _ in range(n):
        fn()
    grew = (rss_mb() - r0) / n
    print(f"{name}: {grew:.1f} MB retained per {mb_per_call:.0f} MB "
          f"transferred", flush=True)


def main() -> None:
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    host = rng.integers(0, 256, (512, 256, 256, 3), dtype=np.uint8)
    f = jax.jit(lambda x: x.astype(jnp.float32).sum())

    def v_device_put():
        dev = jax.device_put(host)
        f(dev).block_until_ready()
        dev.delete()

    probe("device_put + delete", v_device_put)

    sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def v_mafpld():
        dev = jax.make_array_from_process_local_data(sh, host)
        f(dev).block_until_ready()
        dev.delete()

    probe("make_array_from_process_local_data", v_mafpld)

    g = jax.jit(lambda k: jax.random.randint(
        k, (512, 256, 256, 3), 0, 256, jnp.uint8).astype(jnp.float32).sum())
    key = jax.random.PRNGKey(0)
    r0 = rss_mb()
    for i in range(20):
        g(jax.random.fold_in(key, i)).block_until_ready()
    print(f"on-device generation (no transfer): "
          f"{(rss_mb() - r0) / 20:.2f} MB/step", flush=True)


if __name__ == "__main__":
    main()
