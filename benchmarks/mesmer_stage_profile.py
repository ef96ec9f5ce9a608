"""Isolate where the Mesmer forward time goes at large image sizes.

Motivation (PERF.md r3): 42% MFU at 512²/batch-16 but only ~16% at
1024²/batch-2 with identical per-pixel FLOPs — this times truncated
models (backbone only / backbone+FPN / full) and a pixel-count-matched
512² configuration to separate resolution effects from batch effects.

Usage: python benchmarks/mesmer_stage_profile.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timed(fn, x, variables, reps=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(v, xb):
        def body(carry, _):
            p = dict(v["params"])
            tp = dict(p["tensor_product"])
            tp["kernel"] = tp["kernel"] * (1.0 + carry)
            p["tensor_product"] = tp
            out = fn({"params": p, "batch_stats": v["batch_stats"]}, xb)
            s = jnp.sum(out.astype(jnp.float32))
            return (s % 7).astype(jnp.float32) * 1e-12, s
        _, out = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return out

    np.asarray(loop(variables, x))  # warm
    best = float("inf")
    for t in range(3):
        import jax
        xb = jax.block_until_ready(x * (1.0001 + 1e-4 * t))
        t0 = time.perf_counter()
        np.asarray(loop(variables, xb))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import jax.numpy as jnp

    from ark_tpu.models import unet
    from ark_tpu.models.unet import FPN, ResNet50Backbone, SemanticHead

    results = {}
    for size, batch in ((1024, 2), (512, 8), (512, 16)):
        model, variables = unet.init_mesmer(input_shape=(1, size, size, 2))
        x = jnp.asarray(np.random.default_rng(0).random(
            (batch, size, size, 2), ), jnp.float32)

        def full(v, xb):
            out = model.apply(v, xb, train=False)
            return out["whole_cell_inner_distance"]

        import flax.linen as nn

        dense = nn.Dense(3, dtype=jnp.bfloat16)
        bb = ResNet50Backbone(dtype=jnp.bfloat16)
        fpn = FPN(channels=256, dtype=jnp.bfloat16)

        def _stem(v, xb):
            xb = xb.astype(jnp.bfloat16)
            loc_b, h, w, _ = xb.shape
            ys = jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1)
            xs = jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1)
            loc = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
            loc = jnp.broadcast_to(loc[None], (loc_b, h, w, 2))
            xin = jnp.concatenate([xb, loc.astype(jnp.bfloat16)], axis=-1)
            z = dense.apply({"params": v["params"]["tensor_product"]}, xin)
            return bb.apply(
                {"params": v["params"]["ResNet50Backbone_0"],
                 "batch_stats": v["batch_stats"]["ResNet50Backbone_0"]},
                z, False)

        def backbone_only(v, xb):
            return _stem(v, xb)[-1].astype(jnp.float32)

        def through_fpn(v, xb):
            feats = _stem(v, xb)
            pyr = fpn.apply({"params": v["params"]["FPN_0"]}, feats[1:])
            return pyr[0].astype(jnp.float32)

        key = f"{size}x{size}_b{batch}"
        r = {}
        r["full_s"] = timed(full, x, variables)
        r["backbone_s"] = timed(backbone_only, x, variables)
        r["fpn_s"] = timed(through_fpn, x, variables)
        r["heads_s"] = round(r["full_s"] - r["fpn_s"], 5)
        r = {k: round(v, 5) for k, v in r.items()}
        n_px = batch * size * size
        r["full_ms_per_Mpx"] = round(r["full_s"] / n_px * 1e9, 2)
        results[key] = r
        print(json.dumps({key: r}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
