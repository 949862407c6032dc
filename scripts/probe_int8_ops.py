"""Probe which int8 VPU forms Mosaic accepts on this toolchain (the
PERF.md 'toolchain-gated kernel upside' items): i1->i8 select, int8
muli, i32->i8 convert placement. Compile-and-run only, tiny shapes."""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(name, kernel, out_dtype=jnp.int32, out_shape=(8, 128)):
    try:
        with jax.enable_x64(False):
            f = pl.pallas_call(
                kernel,
                out_specs=pl.BlockSpec(out_shape, lambda: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
                ],
            )
            a = jnp.asarray(np.arange(8 * 128).reshape(8, 128) % 7, jnp.int32)
            b = jnp.asarray(np.arange(8 * 128).reshape(8, 128) % 5, jnp.int32)
            out = jax.jit(f)(a, b)
            out.block_until_ready()
        print(f"{name}: OK  sample={np.asarray(out)[0, :4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL  {msg}")
        return False


def k_select_i8(a_ref, b_ref, o_ref):
    # i1 mask from i32 compare selecting int8 operands
    m = a_ref[:, :] == b_ref[:, :]
    one = jnp.ones((8, 128), jnp.int8)
    zero = jnp.zeros((8, 128), jnp.int8)
    o_ref[:, :] = jnp.where(m, one, zero).astype(jnp.int32)


def k_muli_i8(a_ref, b_ref, o_ref):
    a8 = a_ref[:, :].astype(jnp.int8)
    b8 = b_ref[:, :].astype(jnp.int8)
    o_ref[:, :] = (a8 * b8).astype(jnp.int32)


def k_convert_i8(a_ref, b_ref, o_ref):
    # plain i32 -> i8 convert + back
    o_ref[:, :] = a_ref[:, :].astype(jnp.int8).astype(jnp.int32)


def k_select_i8_var(a_ref, b_ref, o_ref):
    # select between an int8 VALUE plane and zero (the limb-plane form)
    m = a_ref[:, :] == b_ref[:, :]
    v8 = b_ref[:, :].astype(jnp.int8)
    o_ref[:, :] = jnp.where(m, v8, jnp.zeros((8, 128), jnp.int8)).astype(jnp.int32)


def k_mul_i32_to_i8(a_ref, b_ref, o_ref):
    # current kernel's form: i32 mul then one astype at the end
    m = jnp.where(a_ref[:, :] == b_ref[:, :], 1, 0)
    prod = b_ref[:, :] * m
    o_ref[:, :] = prod.astype(jnp.int8).astype(jnp.int32)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run_case("select_i8_const (i1 mask -> int8 0/1)", k_select_i8)
    run_case("muli_i8 (int8 * int8)", k_muli_i8)
    run_case("convert_i32_i8", k_convert_i8)
    run_case("select_i8_value (i1 mask -> int8 value/0)", k_select_i8_var)
    run_case("mul_i32_then_i8 (current form)", k_mul_i32_to_i8)
