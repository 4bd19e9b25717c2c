"""Bisect the TPU-worker instability on jumbo host->device uploads.

Round-2 NOTES recorded two tunnel-worker crashes while uploading
multi-10-MB one-shot chunks (jax batched_device_put).  This probe walks
upload sizes and shapes to find the reproducible trigger (if any):

  python tools/bisect_jumbo.py [--max-mb 512]

Per step it uploads an int8 array, forces materialization, frees it, and
prints size / wall / effective bandwidth.  A crash leaves the last
printed line as the bisection bound; the engine's chunked-upload
workaround can then cite a measured limit instead of folklore.
"""

import sys
import time

import numpy as np


def main():
    max_mb = 512
    if "--max-mb" in sys.argv:
        max_mb = int(sys.argv[sys.argv.index("--max-mb") + 1])
    import jax
    import jax.numpy as jnp
    print(f"# devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    mb = 2
    while mb <= max_mb:
        n = mb << 20
        host = rng.integers(-100, 100, size=(n // 2048, 2048),
                            dtype=np.int8)
        t0 = time.time()
        dev = jnp.asarray(host)
        jax.block_until_ready(dev)
        dt = time.time() - t0
        print(f"single {mb:5d} MB  {dt:7.2f}s  {mb / dt:7.1f} MB/s",
              flush=True)
        del dev
        mb *= 2

    # many mid-size arrays in one shot (the batched_device_put shape the
    # crash was observed under)
    for count, each_mb in ((8, 16), (16, 16), (8, 32)):
        hosts = [rng.integers(-100, 100, size=((each_mb << 20) // 2048,
                                               2048), dtype=np.int8)
                 for _ in range(count)]
        import jax
        t0 = time.time()
        devs = [jnp.asarray(h) for h in hosts]
        jax.block_until_ready(devs)
        dt = time.time() - t0
        tot = count * each_mb
        print(f"batch  {count} x {each_mb} MB = {tot} MB  {dt:7.2f}s  "
              f"{tot / dt:7.1f} MB/s", flush=True)
        del devs

    print("# completed without a crash", flush=True)


if __name__ == "__main__":
    main()
