"""Isolate the non-matmul overhead in the SDR Gram kernel.

Variants (all x1, bench shape 64 x 16 s):
  full        — the shipped kernel (epilogue rolls + accumulation)
  no_rolls    — epilogue's 9 masked-roll steps replaced by a plain column sum
  no_epilogue — last-step epilogue replaced by two row reads of the scratch
  one_step    — FB=512: a single grid step per batch row (no accumulation)
  lag128      — 128-lag-block formulation: 5 frame-shifted right operands in
                one (128, F)x(F, 1280) Gram, 7-step rolls on (128,128) tiles

Chain depth 128 per dispatch; interleaved rounds.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fsem_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_speech_enhancement_metrics_tpu.benchmarking.runner import configure_cache

configure_cache()

CHAIN = 128
BATCH, T, H = 64, 256000, 512


def make_gram_variant(mode, fb=128):
    def kernel(c1_ref, c2_ref, d1_ref, d2_ref, out_ref, g0_ref, g1_ref, *, h, fb, f_total):
        j = pl.program_id(1)
        n_j = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            g0_ref[:] = jnp.zeros_like(g0_ref)
            g1_ref[:] = jnp.zeros_like(g1_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (fb, 2 * h), 0)
        f_idx = j * fb + rows
        y = jnp.where(
            f_idx < f_total,
            jnp.concatenate([c1_ref[0], d1_ref[0]], axis=1),
            0.0,
        )
        y_next = jnp.concatenate([c2_ref[0][:1], d2_ref[0][:1]], axis=1)
        y_up = pltpu.roll(y, shift=fb - 1, axis=0)
        y_up = jnp.where(rows < fb - 1, y_up, y_next)
        y_up = jnp.where(f_idx + 1 < f_total, y_up, 0.0)
        c_blk = y[:, :h]

        dims = (((0,), (0,)), ((), ()))
        a = c_blk.astype(jnp.bfloat16)
        g0_ref[:] += jax.lax.dot_general(
            a, y.astype(jnp.bfloat16), dims, preferred_element_type=jnp.float32
        )
        g1_ref[:] += jax.lax.dot_general(
            a, y_up.astype(jnp.bfloat16), dims, preferred_element_type=jnp.float32
        )

        @pl.when(j == n_j - 1)
        def _():
            if mode == "no_epilogue":
                rows2 = jax.lax.broadcasted_iota(jnp.int32, (2, h), 0)
                out_ref[0] = jnp.where(rows2 == 0, g0_ref[:1, :h], g1_ref[:1, :h])
                return
            i_idx = jax.lax.broadcasted_iota(jnp.int32, (h, 2 * h), 0)
            l_idx = jax.lax.broadcasted_iota(jnp.int32, (h, 2 * h), 1) % h
            m = jnp.where(l_idx >= i_idx, g0_ref[:], g1_ref[:])
            m_cc, m_cd = m[:, :h], m[:, h:]
            if mode != "no_rolls":
                i_col = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
                k, s = 0, 1
                while s < h:
                    bit = (i_col >> k) % 2 == 1
                    m_cc = jnp.where(bit, pltpu.roll(m_cc, shift=h - s, axis=1), m_cc)
                    m_cd = jnp.where(bit, pltpu.roll(m_cd, shift=h - s, axis=1), m_cd)
                    k, s = k + 1, s * 2
            r_cc = jnp.sum(m_cc, axis=0, keepdims=True)
            r_cd = jnp.sum(m_cd, axis=0, keepdims=True)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (2, h), 0)
            out_ref[0] = jnp.where(rows2 == 0, r_cc, 0.0) + jnp.where(rows2 == 1, r_cd, 0.0)

    def run(c, d):
        h = H
        batch, t = c.shape
        f_total = t // h
        n_fb = -(-f_total // fb)
        cc = c.reshape(batch, f_total, h)
        dc = d.reshape(batch, f_total, h)
        spec1 = pl.BlockSpec((1, fb, h), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
        spec2 = pl.BlockSpec(
            (1, fb, h), lambda b, j: (b, jnp.minimum(j + 1, n_fb - 1), 0),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            functools.partial(kernel, h=h, fb=fb, f_total=f_total),
            grid=(batch, n_fb),
            in_specs=[spec1, spec2, spec1, spec2],
            out_specs=pl.BlockSpec((1, 2, h), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, 2, h), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((h, 2 * h), jnp.float32),
                pltpu.VMEM((h, 2 * h), jnp.float32),
            ],
        )(cc, cc, dc, dc)
        return out[:, 0], out[:, 1]

    return run


def make_lag128(fb=512, hb=128):
    """l = 128a + b decomposition: one (hb, 10*hb) Gram per row via 5
    frame-shifted right operands; rolls act on (hb, hb) tiles."""

    def kernel(c_ref, d_ref, out_ref, g_ref, *, hb, fb, f_total):
        j = pl.program_id(1)
        n_j = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            g_ref[:] = jnp.zeros_like(g_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (fb, hb), 0)
        f_idx = j * fb + rows
        c_blk = jnp.where(f_idx < f_total, c_ref[0], 0.0)
        d_blk = jnp.where(f_idx < f_total, d_ref[0], 0.0)

        # right operand: [C_0..C_4 | D_0..D_4], shift s = frames rolled up s
        def shifts(x):
            outs = [x]
            cur = x
            for s in range(1, 5):
                cur = pltpu.roll(cur, shift=fb - 1, axis=0)
                cur = jnp.where(rows < fb - s, cur, 0.0)  # in-block only
                outs.append(cur)
            return jnp.concatenate(outs, axis=1)

        b_op = jnp.concatenate([shifts(c_blk), shifts(d_blk)], axis=1)
        dims = (((0,), (0,)), ((), ()))
        g_ref[:] += jax.lax.dot_general(
            c_blk.astype(jnp.bfloat16),
            b_op.astype(jnp.bfloat16),
            dims,
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == n_j - 1)
        def _():
            g = g_ref[:]  # (hb, 10*hb)
            i_idx = jax.lax.broadcasted_iota(jnp.int32, (hb, 4 * hb), 0)
            l_idx = jax.lax.broadcasted_iota(jnp.int32, (hb, 4 * hb), 1) % hb
            # M_a = triu(G_a) + tril(G_{a+1}, -1), a = 0..3, both pairs
            m_c = jnp.where(l_idx >= i_idx, g[:, : 4 * hb], g[:, hb : 5 * hb])
            m_d = jnp.where(
                l_idx >= i_idx, g[:, 5 * hb : 9 * hb], g[:, 6 * hb : 10 * hb]
            )
            i_col = jax.lax.broadcasted_iota(jnp.int32, (hb, hb), 0)
            k, s = 0, 1
            while s < hb:
                bit = (i_col >> k) % 2 == 1
                parts_c, parts_d = [], []
                for a in range(4):
                    sl = slice(a * hb, (a + 1) * hb)
                    parts_c.append(
                        jnp.where(bit, pltpu.roll(m_c[:, sl], shift=hb - s, axis=1), m_c[:, sl])
                    )
                    parts_d.append(
                        jnp.where(bit, pltpu.roll(m_d[:, sl], shift=hb - s, axis=1), m_d[:, sl])
                    )
                m_c = jnp.concatenate(parts_c, axis=1)
                m_d = jnp.concatenate(parts_d, axis=1)
                k, s = k + 1, s * 2
            r_cc = jnp.sum(m_c, axis=0, keepdims=True)
            r_cd = jnp.sum(m_d, axis=0, keepdims=True)
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (2, 4 * hb), 0)
            out_ref[0] = jnp.where(rows2 == 0, r_cc, 0.0) + jnp.where(rows2 == 1, r_cd, 0.0)

    def run(c, d):
        batch, t = c.shape
        f_total = t // hb
        n_fb = -(-f_total // fb)
        cc = c.reshape(batch, f_total, hb)
        dc = d.reshape(batch, f_total, hb)
        spec = pl.BlockSpec((1, fb, hb), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(kernel, hb=hb, fb=fb, f_total=f_total),
            grid=(batch, n_fb),
            in_specs=[spec, spec],
            out_specs=pl.BlockSpec(
                (1, 2, 4 * hb), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, 2, 4 * hb), jnp.float32),
            scratch_shapes=[pltpu.VMEM((hb, 10 * hb), jnp.float32)],
        )(cc, dc)
        return out[:, 0], out[:, 1]

    return run


rng = np.random.default_rng(0)
c = jnp.asarray(rng.standard_normal((BATCH, T)), dtype=jnp.float32)
d = jnp.asarray(np.asarray(c) + 0.3 * rng.standard_normal(c.shape), dtype=jnp.float32)


def chain(fn, n=CHAIN):
    @jax.jit
    def run(c, d, seed):
        s = 1.0 + seed * 1e-12
        outs = None
        for _ in range(n):
            r0, b = fn(c * s, d)
            s = 1.0 + jnp.abs(r0[0, 0]) * 1e-12
            outs = (r0[:, :8], b[:, :8])
        return outs

    return lambda i: np.asarray(run(c, d, jnp.float32(i))[0])


VARIANTS = {
    "full fb=128": chain(make_gram_variant("full")),
    "no_rolls": chain(make_gram_variant("no_rolls")),
    "no_epilogue": chain(make_gram_variant("no_epilogue")),
    "one_step fb=512": chain(make_gram_variant("full", fb=512)),
    "lag128 fb=512": chain(make_lag128()),
    "lag128 fb=256": chain(make_lag128(fb=256)),
}

# correctness of lag128 vs full (both should match on-device)
ra, rb = make_gram_variant("full")(c[:4], d[:4])
la, lb = make_lag128()(c[:4], d[:4])
print(
    "# lag128 vs full dev:",
    float(jnp.max(jnp.abs(ra - la))),
    float(jnp.max(jnp.abs(rb - lb))),
    flush=True,
)

for name, call in VARIANTS.items():
    t0 = time.perf_counter()
    call(0)
    print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

results = {k: [] for k in VARIANTS}
for r in range(4):
    for name, call in VARIANTS.items():
        t0 = time.perf_counter()
        call(r + 1)
        dt = (time.perf_counter() - t0) / CHAIN * 1e3
        results[name].append(dt)
print()
for name, ts in results.items():
    med = sorted(ts)[len(ts) // 2]
    print(f"MEDIAN {name:16s} {med:6.3f} ms/eval", flush=True)
