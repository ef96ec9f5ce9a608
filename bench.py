"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: Pixie SOM BMU-mapping throughput (Mpixels/s) — the reference's
single hottest kernel (pyFlowSOM C `map_data_to_nodes` over 1M-row chunks,
`cluster_helpers.py:118-163`), here the fused Pallas distance-matmul+argmin.

vs_baseline = speedup over a multithreaded-BLAS numpy implementation of the
same BMU search measured on this host's CPU (a *stronger* baseline than the
reference's single-threaded C chunk loop).
"""

import json
import sys
import time

import numpy as np


def _bench_tpu(n, c, k, reps=10):
    import jax
    import jax.numpy as jnp
    from ark_tpu.ops import som

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((n, c)), jnp.float32)
    w = jnp.asarray(rng.random((k, c)), jnp.float32)

    use_pallas = jax.default_backend() == "tpu"

    def one(d):
        if use_pallas:
            idx, _ = som.bmu_pallas(w, d, return_dist=False)
        else:
            idx, _ = som.bmu_xla(w, d)
        return idx

    # each rep's input depends on the previous output so XLA cannot hoist the
    # kernel out of the loop (and the remote relay cannot replay a cached
    # execution) — the measured time includes one extra elementwise pass over
    # the data per rep, so this modestly UNDERSTATES kernel throughput
    @jax.jit
    def loop(d):
        def body(carry, _):
            idx = one(d * (1.0 + carry))
            s = jnp.sum(idx)
            return (s % 7).astype(jnp.float32) * 1e-12, s
        _, out = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return out

    out = loop(data)
    np.asarray(out)  # warmup + force completion
    best = float("inf")
    for trial in range(3):  # best-of-3: the first post-compile execution on
        # this attach is often 3-6x slower than steady state
        t0 = time.perf_counter()
        out = loop(data * (1.0001 + 1e-4 * trial))
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return n / best / 1e6  # Mpix/s


def _bench_cpu_numpy(n, c, k, chunk=1_000_000):
    # float32 BLAS baseline (faster than pyFlowSOM's float64 single-thread C)
    rng = np.random.default_rng(0)
    data = rng.random((n, c)).astype(np.float32)
    w = rng.random((k, c)).astype(np.float32)
    w2 = (w * w).sum(1)

    def run():
        for i in range(0, n, chunk):
            x = data[i:i + chunk]
            d = w2[None, :] - 2.0 * (x @ w.T)
            d.argmin(axis=1)

    run()  # warm allocator / BLAS
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return n / dt / 1e6


def main():
    N, C, K = 4_194_304, 16, 100
    tpu_mpix = _bench_tpu(N, C, K)
    cpu_mpix = _bench_cpu_numpy(1_048_576, C, K)
    print(json.dumps({
        "metric": "som_bmu_map_throughput",
        "value": round(tpu_mpix, 1),
        "unit": "Mpixels/s",
        "vs_baseline": round(tpu_mpix / cpu_mpix, 1),
    }))
    print(f"[bench] cpu numpy baseline: {cpu_mpix:.1f} Mpix/s "
          f"(N={N}, C={C}, K={K})", file=sys.stderr)


if __name__ == "__main__":
    main()
