"""Bisect the fused taumol-LW kernel cost: time reduced variants.

Each variant keeps the same input/output contract but drops pieces, so
the deltas attribute kernel time to (majors, eta-minors, epilogue,
scat assembly, planck). Inputs are synthetic (timing only; lowm split
~60/40 lower/upper like the 72L atmosphere).
"""
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/profiling")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from timing2 import bench_loop as bench, report

import geosradiation_gridcomp_tpu.models.rrtmg.taumol_lw_pallas as tp

NCOL, NLAY = 2048, 72
N = NCOL * NLAY
C = tp._CBLK
NGPTLW = tp.NGPTLW
kt = tp._kernel_tables()

shapes = dict(weta0=48, weta1=48, wetau0=32, wetau1=32, rows=4, facs=4,
              colv=64, lowm=1, t19=19, wsf=16, fac13=16, emw=64, w3u=8,
              wpl=81, wpl5=15, halc=8)
ORDER = ("weta0", "weta1", "wetau0", "wetau1", "rows", "facs", "colv",
         "lowm", "t19", "wsf", "fac13", "emw", "w3u", "wpl", "wpl5",
         "halc")


def synth_ci(eps):
    """Generate synthetic cell inputs INSIDE jit (cheap iota hashing) so
    the bench closure embeds no large constants (the axon tunnel caps
    compile payloads)."""
    ci = {}
    for j, k in enumerate(ORDER):
        w = shapes[k]
        r = lax.broadcasted_iota(jnp.uint32, (N, w), 0) \
            * jnp.uint32(2654435761) \
            + lax.broadcasted_iota(jnp.uint32, (N, w), 1) \
            * jnp.uint32(40503) + jnp.uint32(j * 97)
        u = ((r >> 8) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
        if k == "rows":
            ci[k] = (u * 63.0).astype(jnp.int32)
        elif k == "lowm":
            lay = lax.broadcasted_iota(jnp.int32, (N, 1), 0) // NCOL
            ci[k] = (lay < int(NLAY * 0.6)).astype(jnp.float32)
        else:
            ci[k] = u + eps
    return ci

FLAGS = os.environ.get("PARTS", "all")


def make(parts):
    def kern(*refs):
        (weta0_ref, weta1_ref, wetau0_ref, wetau1_ref, rows_ref,
         facs_ref, colv_ref, lowm_ref, t19_ref, wsf_ref, fac13_ref,
         emw_ref, w3u_ref, wpl_ref, wpl5_ref, halc_ref) = refs[:16]
        tabs = dict(zip(tp._TABLE_KEYS, refs[16:16 + len(tp._TABLE_KEYS)]))
        taug_ref, pfr_ref = refs[16 + len(tp._TABLE_KEYS):]
        f32 = jnp.float32
        lowm = lowm_ref[:]
        upm = 1.0 - lowm
        has_low = jnp.max(lowm) > 0.0
        has_up = jnp.max(upm) > 0.0

        def onehot(rcol, fcol, iota, m):
            r = rows_ref[:, rcol:rcol + 1]
            f = facs_ref[:, fcol:fcol + 1] * m
            return jnp.where(iota == r, f, 0.0)

        def dot(a, b):
            return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=lax.Precision.HIGHEST)

        def dflt(a, b):
            return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32,
                                   precision=lax.Precision.DEFAULT)

        def bfsplit(a):
            hi = a.astype(jnp.bfloat16).astype(f32)
            return hi, a - hi

        def dot3(a, b_hi, b_lo):
            a_hi, a_lo = bfsplit(a)
            return dflt(a_hi, b_hi) + dflt(a_lo, b_hi) + dflt(a_hi, b_lo)

        def dot2(a, b01):
            a_hi, a_lo = bfsplit(a)
            return dflt(a_hi, b01) + dflt(a_lo, b01)

        zc = jnp.zeros((C, 128), f32)
        z64 = jnp.zeros((C, 64), f32)
        z16 = jnp.zeros((C, 16), f32)
        zg = jnp.zeros((C, NGPTLW), f32)

        def low_part():
            i71 = lax.broadcasted_iota(jnp.int32, (C, 71), 1)
            acc = zc
            uss = z64
            acc_em = zc
            plo = zg
            if "maj" in parts:
                wal = onehot(0, 0, i71, lowm) + onehot(1, 1, i71, lowm)
                wbl = onehot(2, 2, i71, lowm) + onehot(3, 3, i71, lowm)
                ua = dot3(wal, tabs["a_low_hi"][:], tabs["a_low_lo"][:])
                ub = dot3(wbl, tabs["a_low_hi"][:], tabs["a_low_lo"][:])
                w0 = dot2(weta0_ref[:, 0:45], tabs["bd_low"][:])
                w1 = dot2(weta1_ref[:, 0:45], tabs["bd_low"][:])
                s = w0 * ua + w1 * ub
                for e in range(9):
                    acc = acc + s[:, e * 128:(e + 1) * 128]
                uss = ua[:, 9 * 128: 9 * 128 + 64] \
                    + ub[:, 9 * 128: 9 * 128 + 64]
            if "em" in parts:
                u = dot(t19_ref[:], tabs["em_flat"][:])
                wev = dot(emw_ref[:], tabs["seg_em"][:])
                prod = u * wev
                for e in range(9):
                    acc_em = acc_em + prod[:, e * 128:(e + 1) * 128]
            if "pl" in parts:
                plo = dot(wpl_ref[:, 0:81], tabs["p9_scat"][:]) \
                    + tabs["pconst"][0:1, :]
            return acc, uss, acc_em, plo

        def up_part():
            i235 = lax.broadcasted_iota(jnp.int32, (C, 235), 1) + 65
            acc = zc
            acc_u = z64
            uss = z64
            acc3 = z16
            phi = zg
            if "maj" in parts:
                wau = onehot(0, 0, i235, upm) + onehot(1, 1, i235, upm)
                wbu = onehot(2, 2, i235, upm) + onehot(3, 3, i235, upm)
                ua = dot3(wau, tabs["a_up_hi"][:], tabs["a_up_lo"][:])
                ub = dot3(wbu, tabs["a_up_hi"][:], tabs["a_up_lo"][:])
                w0 = dot2(wetau0_ref[:, 0:25], tabs["bd_up"][:])
                w1 = dot2(wetau1_ref[:, 0:25], tabs["bd_up"][:])
                s = w0 * ua + w1 * ub
                acc = s[:, 0:128]
                for e in range(4):
                    acc_u = acc_u + s[:, 128 + e * 64: 128 + (e + 1) * 64]
                uss = ua[:, 384:448] + ub[:, 384:448]
            if "em" in parts:
                u3 = dot(t19_ref[:], tabs["b3u_flat"][:])
                for e in range(5):
                    acc3 = acc3 + w3u_ref[:, e:e + 1] \
                        * u3[:, e * 16:(e + 1) * 16]
            if "pl" in parts:
                phi = dot(wpl5_ref[:, 0:15], tabs["p5_scat"][:]) \
                    + tabs["pconst"][1:2, :]
            return acc, acc_u, uss, acc3, phi

        if "cond" in parts:
            acc_l, uss_l, acc_em, plo = lax.cond(
                has_low, low_part, lambda: (zc, z64, zc, zg))
            acc_h, acc_u, uss_h, acc3, phi = lax.cond(
                has_up, up_part, lambda: (zc, z64, z64, z16, zg))
        else:
            acc_l, uss_l, acc_em, plo = low_part()
            acc_h, acc_u, uss_h, acc3, phi = up_part()

        acc = acc_l + acc_h
        acc_ss = colv_ref[:] * (uss_l + uss_h)
        if "scat" in parts:
            taug = dot(acc, tabs["scat_sp2"][:]) \
                + dot(acc_u, tabs["scat_u14"][:]) \
                + dot(acc_ss, tabs["scat_ss"][:]) \
                + dot(acc_em, tabs["scat_em"][:]) \
                + dot(acc3, tabs["scat_b3"][:])
        else:
            taug = jnp.broadcast_to(acc[:, 0:1] + acc_u[:, 0:1]
                                    + acc_ss[:, 0:1] + acc_em[:, 0:1]
                                    + acc3[:, 0:1], (C, NGPTLW))
        if "ep" in parts:
            sf = dot(wsf_ref[:], tabs["self10"][:])
            ff = dot(wsf_ref[:], tabs["for4"][:])
            taug = taug + sf + ff * (lowm + upm * tabs["uhf"][0:1, :])
            m_all = dot(t19_ref[:], tabs["m19"][:])
            facv = dot(fac13_ref[:], tabs["seg_m"][:])
            taug = taug + dot(m_all * facv, tabs["scat_m"][:])
            taug = taug + dot(halc_ref[:], tabs["hal_tab"][:])
            corr = 1.0 + (halc_ref[:, 4:5] - 1.0) * tabs["segb"][0:1, :] \
                + (halc_ref[:, 5:6] - 1.0) * tabs["segb"][1:2, :]
            taug = taug * corr
        taug_ref[:] = taug
        pfr_ref[:] = lowm * plo + upm * phi

    in_specs = [pl.BlockSpec((C, shapes[k]), lambda b: (b, 0))
                for k in ORDER]
    in_specs += [pl.BlockSpec(kt[k].shape,
                              lambda b, _s=len(kt[k].shape): (0,) * _s)
                 for k in tp._TABLE_KEYS]
    f = pl.pallas_call(
        kern, grid=(N // C,), in_specs=in_specs,
        out_specs=[pl.BlockSpec((C, NGPTLW), lambda b: (b, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((N, NGPTLW), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def run(eps):
        ci = synth_ci(eps)
        tables = [jnp.asarray(kt[k]) for k in tp._TABLE_KEYS]
        return f(*(ci[k] for k in ORDER), *tables)

    return jax.jit(run)


VARIANTS = [
    ("full", {"maj", "em", "pl", "scat", "ep", "cond"}),
    ("nocond", {"maj", "em", "pl", "scat", "ep"}),
    ("no_ep", {"maj", "em", "pl", "scat", "cond"}),
    ("no_em", {"maj", "pl", "scat", "ep", "cond"}),
    ("no_scat", {"maj", "em", "pl", "ep", "cond"}),
    ("maj_only", {"maj", "cond"}),
    ("em_only", {"em", "cond"}),
    ("none", {"cond"}),
]

for name, parts in VARIANTS:
    g = make(frozenset(parts))
    report(name, bench(g, jnp.float32(0.0), n=8), NCOL)
