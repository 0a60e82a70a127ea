#!/usr/bin/env python
"""Mosaic capability probe for the bricked hash-grid kernel design:
strategies for dynamic-row gathers from a VMEM table, and
take_along_axis lane-gather (tpu.dynamic_gather) throughput."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096          # table rows
W = 256           # lanes per row
NPTS = 1 << 17    # points
BLK = 2048

CP = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                          vmem_limit_bytes=100 * 2**20)


def bench(name, fn, *args, ref=None, n=5, per=NPTS):
    f = jax.jit(fn)
    out = np.asarray(f(*args))
    ok = True if ref is None else np.array_equal(out, ref)
    fs = jax.jit(lambda *a: fn(*a).sum())   # scalar download only
    float(fs(*args))
    t0 = time.time()
    for _ in range(n):
        float(fs(*args))
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt*1e3:9.2f} ms  {dt*1e9/per:9.2f} ns/row  ok={ok}",
          flush=True)


# -- 1. dynamic sublane-slice load, plain ------------------------------------
UNROLL = 16


def k_dyn(idx_ref, table_ref, out_ref):
    blk = pl.program_id(0) * BLK

    def body(i, _):
        base = i * UNROLL
        for u in range(UNROLL):
            out_ref[pl.ds(base + u, 1), :] = \
                table_ref[pl.ds(idx_ref[blk + base + u], 1), :]
        return 0
    jax.lax.fori_loop(0, BLK // UNROLL, body, 0)


def dyn(table, idx):
    return pl.pallas_call(
        k_dyn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NPTS // BLK,),
            in_specs=[pl.BlockSpec((R, W), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((BLK, W), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NPTS, W), table.dtype),
        compiler_params=CP,
    )(idx, table)


# -- 2. tile-shaped rows: table (R, 8, 128), dynamic on dim0 ------------------
def k_dyn3(idx_ref, table_ref, out_ref):
    blk = pl.program_id(0) * BLK

    def body(i, _):
        out_ref[pl.ds(i, 1)] = table_ref[pl.ds(idx_ref[blk + i], 1)]
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)


def dyn3(table3, idx):
    return pl.pallas_call(
        k_dyn3,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NPTS // BLK,),
            in_specs=[pl.BlockSpec((R, 8, 128), lambda i, *_: (0, 0, 0))],
            out_specs=pl.BlockSpec((BLK, 8, 128), lambda i, *_: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NPTS, 8, 128), table3.dtype),
        compiler_params=CP,
    )(idx, table3)


# -- 3. per-row local DMA (async_copy), 8 in flight ---------------------------
def k_dma(idx_ref, table_ref, out_ref, sems):
    blk = pl.program_id(0) * BLK
    NQ = 8

    def copy(i, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[blk + i], 1)],
            out_ref.at[pl.ds(i, 1)],
            sems.at[slot],
        )

    def body(i, _):
        copy(i, i % NQ).start()

        @pl.when(i >= NQ - 1)
        def _():
            copy(i - NQ + 1, (i - NQ + 1) % NQ).wait()
        return 0
    jax.lax.fori_loop(0, BLK, body, 0)

    def drain(j, _):
        i = BLK - NQ + 1 + j
        copy(i, i % NQ).wait()
        return 0
    jax.lax.fori_loop(0, NQ - 1, drain, 0)


def dma(table3, idx):
    return pl.pallas_call(
        k_dma,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NPTS // BLK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((BLK, 8, 128), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NPTS, 8, 128), table3.dtype),
        compiler_params=CP,
    )(idx, table3)


# -- 4. lane gather (tpu.dynamic_gather) --------------------------------------
def k_lane(x_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def lane(x, gidx):
    return pl.pallas_call(
        k_lane,
        grid=(NPTS // BLK,),
        in_specs=[pl.BlockSpec((BLK, 128), lambda i: (i, 0)),
                  pl.BlockSpec((BLK, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NPTS, 128), x.dtype),
        compiler_params=CP,
    )(x, gidx)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.key(0)
    table = jax.random.normal(key, (R, W), jnp.float32)
    idx = jax.random.randint(key, (NPTS,), 0, R, jnp.int32)
    ref = np.asarray(table)[np.asarray(idx)]

    if which in ("all", "dyn"):
        bench("dyn sublane-slice u8", dyn, table, idx, ref=ref)
    if which in ("all", "dyn3"):
        table3 = table.reshape(R, 2, 128)
        t3 = jnp.tile(table3, (1, 4, 1))  # (R, 8, 128) tile rows
        ref3 = np.asarray(t3)[np.asarray(idx)]
        bench("dyn3 tile-row (R,8,128)", dyn3, t3, idx, ref=ref3)
    if which in ("all", "dma"):
        t3 = jnp.tile(table.reshape(R, 2, 128), (1, 4, 1))
        ref3 = np.asarray(t3)[np.asarray(idx)]
        bench("dma per-row q8", dma, t3, idx, ref=ref3)
    if which in ("all", "lane"):
        x = jax.random.normal(key, (NPTS, 128), jnp.float32)
        gidx = jax.random.randint(key, (NPTS, 128), 0, 128, jnp.int32)
        lref = np.take_along_axis(np.asarray(x), np.asarray(gidx), axis=1)
        bench("lane take_along_axis", lane, x, gidx, ref=lref, per=NPTS)


if __name__ == "__main__":
    main()
