#!/usr/bin/env python
"""Measure eval-only brick-encode kernel variants on real TPU.

The training kernel (ops/pallas/hashgrid_kernel.py) is MXU-bound on
one-hot FLOPs (~16 MFLOP/pt at log2_bricks=12 -> 7.4 Mpts/s forward).
For eval we need 15+ Mpts/s (VERDICT r2 task 2). Variants probed here:

  base     brick_hash_encode forward as-is (all-mxu)
  scalar   all-scalar dynamic-row fetch of PACKED u32 rows: the 256-lane
           bf16 row is bit-packed into 128 u32 lanes (f0 in the high 16
           bits, f1 low), so one fetch moves 512 B and unpacking is two
           VPU bit ops -- no relayout
  mixed    packed-scalar for hashed levels + one-hot MXU for small dense
           levels (overlap scalar fetch with MXU work)

Usage: python scripts/probe_eval_encode.py [bricks] [npts]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from nerf_replication_tpu.ops.pallas import hashgrid_kernel as hk


def bench(name, fn, *args, n=5, per=1):
    f = jax.jit(lambda *a: fn(*a).sum())
    float(f(*args))
    t0 = time.time()
    for _ in range(n):
        float(f(*args))
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt * 1e3:9.2f} ms  {per / dt / 1e6:8.2f} Mpts/s  "
          f"{dt * 1e9 / per:7.2f} ns/pt", flush=True)
    return dt


def main():
    bricks = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    npts = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 20)

    layout = hk.make_brick_layout(12, 16, 512, log2_bricks=bricks)
    print(f"layout: n_rows={layout.n_rows}, strategies(train)="
          f"{hk._strategies(layout)}")
    key = jax.random.key(0)
    table = jax.random.uniform(key, (layout.n_rows, hk.ROW), jnp.float32,
                               -1.0, 1.0)
    # ray-ordered points: 16 samples marching along each of npts/16 rays
    n_rays = npts // 16
    k1, k2, k3 = jax.random.split(key, 3)
    ro = jax.random.uniform(k1, (n_rays, 3), jnp.float32, 0.2, 0.8)
    rd = jax.random.normal(k2, (n_rays, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    t = jnp.linspace(0.0, 0.4, 16)
    x = jnp.clip(ro[:, None] + rd[:, None] * t[:, None],
                 0.0, 1.0).reshape(-1, 3)
    x = np.asarray(x)[:npts]
    x = jnp.asarray(x)

    bench("train fwd (all-mxu)", lambda tb, xx: hk.brick_hash_encode(
        layout, tb, xx), table, x, per=npts)

    from nerf_replication_tpu.ops.pallas import eval_encode as ee

    packed = ee.pack_eval_table(table)
    ref = np.asarray(hk.brick_hash_encode(layout, table, x))
    for name, mxu_max in (("eval scalar (packed u32)", 0),
                          ("eval mixed (mxu<=512)", 512),
                          ("eval mixed (mxu<=1536)", 1536)):
        fn = lambda tb, xx, m=mxu_max: ee.brick_encode_eval(
            layout, tb, xx, mxu_max_rows=m)
        out = np.asarray(jax.jit(fn)(packed, x))
        err = np.max(np.abs(out - ref))
        bench(name, fn, packed, x, per=npts)
        print(f"   max|diff vs train fwd| = {err:.2e}")


if __name__ == "__main__":
    main()
