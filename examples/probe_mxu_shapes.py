#!/usr/bin/env python
"""Micro-benchmark candidate MXU matmul shapes for the all-pairs kernel's
matmul formulation, inside a grid-looped pallas kernel that mimics the real
sweep structure (1024 x 512 subtile visits at N=262k)."""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI, TJ, SUB = 256, 512, 16
NI, NJ = 262144, 262144
GRID = (NI // TI, NJ // (TJ * SUB))


def make_kernel(mode):
    def kernel(pos_i_ref, pos_jt_ref, u_ref, vt_ref, pj_ref, out_ref):
        jo = pl.program_id(1)

        def body(s, acc):
            col = pl.ds(s * TJ, TJ)
            x = jnp.zeros((TI, 1), jnp.float32)
            if "G" in mode:
                g = jnp.dot(pos_i_ref[:], pos_jt_ref[:, col],
                            preferred_element_type=jnp.float32)  # (TI,TJ) K=3
            else:
                g = pos_jt_ref[0:1, col] - pos_i_ref[:, 0:1]
            if "C" in mode:
                c = jnp.dot(u_ref[:], vt_ref[:, col],
                            preferred_element_type=jnp.float32)  # K=8
                g = g * c
            if "S" in mode:
                sp = jnp.dot(g, pj_ref[pl.ds(s * TJ, TJ), :],
                             preferred_element_type=jnp.float32)  # (TI,3)
                acc = acc + jnp.sum(sp, axis=1, keepdims=True)
            else:
                acc = acc + jnp.sum(g, axis=1, keepdims=True)
            return acc + x

        acc = jax.lax.fori_loop(0, SUB, body, jnp.zeros((TI, 1), jnp.float32))
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run(pos_i, pos_jt, u, vt, pj, mode):
    return pl.pallas_call(
        make_kernel(mode),
        grid=GRID,
        in_specs=[
            pl.BlockSpec((TI, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TJ * SUB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TJ * SUB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ * SUB, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TI, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NI, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(pos_i, pos_jt, u, vt, pj)


def main():
    k = jax.random.PRNGKey(0)
    pos_i = jax.random.normal(k, (NI, 3), jnp.float32)
    pos_jt = jax.random.normal(k, (3, NJ), jnp.float32)
    u = jax.random.normal(k, (NI, 8), jnp.float32)
    vt = jax.random.normal(k, (8, NJ), jnp.float32)
    pj = jax.random.normal(k, (NJ, 3), jnp.float32)
    pairs = float(NI) * float(NJ)

    for mode in ["none", "G", "C", "GC", "S", "GCS"]:
        f = lambda: run(pos_i, pos_jt, u, vt, pj, mode)
        float(jnp.sum(f()))
        t0 = time.perf_counter()
        for _ in range(3):
            float(jnp.sum(f()))
        el = (time.perf_counter() - t0) / 3
        print(f"mode={mode:4s}: {el*1e3:8.1f} ms  ({pairs/el:.2e} pairs/s equiv)")


if __name__ == "__main__":
    main()
