"""Round-5 experiment: the tokenize-only ceiling of the scalar decoder.

VERDICT r4 #2: before building a tokenize/materialize split, measure what
Huffman tokenization ALONE can do on the scalar core — table builds, bit
cursor, entry resolution, offset decode, validation — with NO LZ window,
no ring stores, no copies, no flush DMAs.  If tokenize-only clears
~150-200 MB/s the split pays (materialization rides elsewhere); if it
lands near the current full decoder (~60 MB/s mixed), the decode plateau
is the token loop itself and the split cannot reach 100.

Variants:
  tok1   — the current burst/item shape, materialization deleted
  tok4   — 4x-unrolled burst body (select-committed), probing whether the
           while-loop boundary (~8-14 ns/iter) is a real cost or the core
           is issue-bound as the r4 K-way probe suggested
  tokst  — tok1 + one SMEM token store per burst lookup and per item
           (a realistic lower bound for an actual tokenizer stage)

Checks: op (total output bytes implied by the token stream) must equal
the chunk's decompressed length for every chunk.

Run: python scripts/exp_tokenize_ceiling.py [tok1 tok4 tokst] [--cls text]
"""
from __future__ import annotations

import functools
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libdeflate_tpu.decompress.pallas_decode import (
    _build_table_scalar, _shr, _shl, _CONSTS, _C_PP, _C_SL,
    LTB, OTB, PTB, LL_SIZE, OF_SIZE, STAGE_W, K_LIT, K_BASE, K_EOB, K_SUB,
    OK, BAD_DATA,
)


def _tok_kernel(clen_ref, olen_ref, consts_ref, comp_ref,
                status_ref, oplen_ref, acc_ref, stage,
                ll_tab, of_tab, pre_tab, lens, aux, tokbuf, sem_in,
                *, W: int, unroll: int, store_tokens: bool):
    b = pl.program_id(0)
    in_words = _shr(clen_ref[b] + 3, 2)
    olen = olen_ref[b]

    def stage_from(w0):
        w0 = jnp.minimum(w0, W - STAGE_W)
        start = pl.multiple_of(_shl(b * (W // 1024) + _shr(w0, 10), 10),
                               1024)
        cp = pltpu.make_async_copy(
            comp_ref.at[pl.ds(start, STAGE_W)], stage, sem_in)
        cp.start()
        cp.wait()
        return w0

    stage_from(0)

    def peek32(t, base):
        w = _shr(t, 5) - base
        s = t & 31
        lo = _shr(stage[w], s)
        hi = _shl(_shl(stage[w + 1], 31 - s), 1)
        return lo | hi

    def ensure(t, base, margin: int = 1):
        nb = _shl(_shr(jnp.minimum(_shr(t, 5), W - STAGE_W), 10), 10)
        pred = _shr(t, 5) + margin - base >= STAGE_W

        @pl.when(pred)
        def _():
            stage_from(_shr(t, 5))
        return jnp.where(pred, nb, base)

    # ---- block loop: (t, base, op, acc, ntok, status, final, done) ------
    def blk_cond(st):
        t, base, op, acc, ntok, status, final, done = st
        return (done == 0) & (status == OK)

    def blk_body(st):
        t, base, op, acc, ntok, status, final, done = st
        base = ensure(t, base)
        hdr = peek32(t, base)
        t = t + 3
        final = hdr & 1
        btype = _shr(hdr, 1) & 3

        def do_stored(t, base, op, acc, ntok):
            t2 = (t + 7) & ~7
            base2 = ensure(t2, base)
            v = peek32(t2, base2)
            ln = v & 0xFFFF
            nlen = _shr(v, 16) & 0xFFFF
            bad = ((ln ^ 0xFFFF) != nlen) | (op + ln > olen)
            # tokenize-only: a stored block is ONE token (skip the bytes)
            t3 = t2 + 32 + _shl(ln, 3)
            stt = jnp.where(bad, BAD_DATA, jnp.int32(OK))
            return (t3, base2, op + jnp.where(bad, 0, ln),
                    acc ^ ln, ntok + 1, stt)

        def do_huffman(t, base, op, acc, ntok, btype):
            def static_tables():
                def setl(i, _):
                    lens[i] = consts_ref[_C_SL + i]
                    return 0
                jax.lax.fori_loop(0, 320, setl, 0)
                return t, base, jnp.int32(288), jnp.int32(32), jnp.int32(OK)

            def dynamic_tables():
                tt = t
                bb = ensure(tt, base)
                v = peek32(tt, bb)
                num_ll = 257 + (v & 31)
                num_of = 1 + (_shr(v, 5) & 31)
                num_pre = 4 + (_shr(v, 10) & 15)
                tt = tt + 14

                def clr(i, _):
                    lens[1184 + i] = 0
                    return 0
                jax.lax.fori_loop(0, 19, clr, 0)

                def rd_pre(i, st2):
                    tt2, bb2 = st2
                    bb2 = ensure(tt2, bb2)
                    lens[1184 + consts_ref[_C_PP + i]] = (
                        peek32(tt2, bb2) & 7)
                    return (tt2 + 3, bb2)
                tt, bb = jax.lax.fori_loop(0, num_pre, rd_pre, (tt, bb))

                ok = _build_table_scalar(
                    lens, jnp.int32(1184), jnp.int32(19), PTB, pre_tab,
                    jnp.int32(128), 0, aux, consts_ref)

                total = num_ll + num_of

                def rle_cond(st2):
                    i, tt2, bb2, okk = st2
                    return (i < total) & (okk == 1)

                def rle_body(st2):
                    i, tt2, bb2, okk = st2
                    bb2 = ensure(tt2, bb2)
                    w = peek32(tt2, bb2)
                    e = pre_tab[w & ((1 << PTB) - 1)]
                    cl = e & 0xFF
                    sym = _shr(e, 16)
                    tt2 = tt2 + cl
                    bb2 = ensure(tt2, bb2)
                    w2 = peek32(tt2, bb2)

                    def lit_case():
                        lens[i] = sym
                        return (i + 1, tt2, jnp.int32(0))

                    def rep_case():
                        prev = jnp.where(i > 0, lens[jnp.maximum(i - 1, 0)],
                                         0)
                        is16 = sym == 16
                        is17 = sym == 17
                        rep = jnp.where(
                            is16, 3 + (w2 & 3),
                            jnp.where(is17, 3 + (w2 & 7), 11 + (w2 & 127)))
                        ebits = jnp.where(is16, 2, jnp.where(is17, 3, 7))
                        val = jnp.where(is16, prev, 0)
                        bad2 = (is16 & (i == 0)) | (i + rep > total)

                        def wr(k, _):
                            lens[i + k] = val
                            return 0
                        jax.lax.fori_loop(
                            0, jnp.where(bad2, 0, rep), wr, 0)
                        return (i + rep, tt2 + ebits,
                                jnp.where(bad2, 1, 0))

                    i2, tt3, bad = jax.lax.cond(sym < 16, lit_case, rep_case)
                    okk = jnp.where(bad == 1, 0, okk)
                    return (i2, tt3, bb2, okk)

                i, tt, bb, ok2 = jax.lax.while_loop(
                    rle_cond, rle_body, (jnp.int32(0), tt, bb, ok))
                stat = jnp.where(ok2 == 1, OK, BAD_DATA)
                return tt, bb, num_ll, num_of, stat

            tt, bb, num_ll, num_of, stat = jax.lax.cond(
                btype == 1, static_tables, dynamic_tables)

            ok_l = _build_table_scalar(
                lens, jnp.int32(0), num_ll, LTB, ll_tab,
                jnp.int32(LL_SIZE), 1, aux, consts_ref)
            ok_o = _build_table_scalar(
                lens, num_ll, num_of, OTB, of_tab,
                jnp.int32(OF_SIZE), 2, aux, consts_ref)
            stat = jnp.where((ok_l == 0) | (ok_o == 0), BAD_DATA, stat)

            LLM = jnp.int32((1 << LTB) - 1)
            OFM = jnp.int32((1 << OTB) - 1)

            def grp_cond(st2):
                tt2, bb2, oo, ac, nt, stt, eob = st2
                return (stt == OK) & (eob == 0)

            def grp_body(st2):
                tt2, bb2, oo, ac, nt, stt, eob = st2
                bb2 = ensure(tt2, bb2, margin=3)
                stt = jnp.where(
                    _shr(tt2, 5) > in_words + STAGE_W, BAD_DATA, stt)
                bits_left = _shl(bb2 + STAGE_W - 1, 5) - tt2
                niter = jnp.minimum(
                    _shr(jnp.maximum(bits_left - 64, 0), 4),
                    _shr(jnp.maximum(olen - oo, 0), 1))
                w0 = peek32(tt2, bb2)
                e0 = ll_tab[w0 & LLM]

                if unroll == 1:
                    def b_cond(s):
                        t3, o3, a3, n3, w3, e3, nn3 = s
                        return ((_shr(e3, 12) & 3) == K_LIT) & (nn3 > 0)

                    def b_body(s):
                        t3, o3, a3, n3, w3, e3, nn3 = s
                        two = _shr(e3, 14) & 1
                        if store_tokens:
                            tokbuf[n3 & 2047] = e3
                        a3 = a3 ^ e3
                        o4 = o3 + 1 + two
                        t4 = t3 + (e3 & 0xFF)
                        w4 = peek32(t4, bb2)
                        e4 = ll_tab[w4 & LLM]
                        return (t4, o4, a3, n3 + 1, w4, e4, nn3 - 1)

                    tt2, oo, ac, nt, w, e, _ = jax.lax.while_loop(
                        b_cond, b_body, (tt2, oo, ac, nt, w0, e0, niter))
                else:
                    # unrolled burst: `unroll` select-committed steps per
                    # loop boundary; a non-literal freezes the state (its
                    # consume is masked to 0 so t/w/e stay put)
                    def b_cond(s):
                        t3, o3, a3, n3, w3, e3, nn3 = s
                        return ((_shr(e3, 12) & 3) == K_LIT) & (nn3 > 0)

                    def b_body(s):
                        t3, o3, a3, n3, w3, e3, nn3 = s
                        for _k in range(unroll):
                            is_l = ((_shr(e3, 12) & 3) == K_LIT) & (nn3 > 0)
                            two = _shr(e3, 14) & 1
                            if store_tokens:
                                tokbuf[n3 & 2047] = jnp.where(
                                    is_l, e3, tokbuf[n3 & 2047])
                            a3 = jnp.where(is_l, a3 ^ e3, a3)
                            o3 = o3 + jnp.where(is_l, 1 + two, 0)
                            n3 = n3 + jnp.where(is_l, 1, 0)
                            t3 = t3 + jnp.where(is_l, e3 & 0xFF, 0)
                            nn3 = nn3 - jnp.where(is_l, 1, 0)
                            w3 = peek32(t3, bb2)
                            e3 = jnp.where(is_l, ll_tab[w3 & LLM], e3)
                        return (t3, o3, a3, n3, w3, e3, nn3)

                    tt2, oo, ac, nt, w, e, _ = jax.lax.while_loop(
                        b_cond, b_body, (tt2, oo, ac, nt, w0, e0, niter))

                is_sub = (_shr(e, 12) & 3) == K_SUB
                sidx = (_shr(e, 16)
                        + (_shr(w, LTB) & (_shl(1, _shr(e, 8) & 0xF) - 1)))
                e = jnp.where(is_sub,
                              ll_tab[jnp.where(is_sub, sidx, 0)], e)
                kind = _shr(e, 12) & 3
                consume = e & 0xFF
                cl = _shr(e, 8) & 0xF
                payload = _shr(e, 16)

                is_lit = kind == K_LIT
                two = _shr(e, 14) & 1
                is_eob = (kind == K_EOB) & (payload == 0)
                is_badk = ((kind == K_EOB) & (payload != 0)) | (kind == K_SUB)
                is_mat = kind == K_BASE

                length = (payload
                          + (_shr(w, cl) & (_shl(1, consume - cl) - 1)))
                tt4 = tt2 + consume
                oe = of_tab[_shr(w, consume) & OFM]
                w2 = peek32(tt4, bb2)
                osub = (_shr(oe, 12) & 3) == K_SUB
                oidx = (_shr(oe, 16)
                        + (_shr(w2, OTB) & (_shl(1, _shr(oe, 8) & 0xF) - 1)))
                oe = jnp.where(osub, of_tab[jnp.where(osub, oidx, 0)], oe)
                okind = _shr(oe, 12) & 3
                ocons = oe & 0xFF
                ocl = _shr(oe, 8) & 0xF
                dist = (_shr(oe, 16)
                        + (_shr(w2, ocl) & (_shl(1, ocons - ocl) - 1)))

                tt2 = tt4 + jnp.where(is_mat, ocons, 0)
                nb = 1 + two
                bad = (is_badk
                       | (is_mat & ((okind != K_BASE) | (dist > oo)
                                    | (oo + length > olen)))
                       | (is_lit & (oo + nb > olen)))
                stt = jnp.where(bad, BAD_DATA, stt)
                eob = jnp.where(is_eob & (~bad), 1, eob)
                ln = jnp.where(bad | is_eob, 0,
                               jnp.where(is_lit, nb, length))
                if store_tokens:
                    tokbuf[nt & 2047] = _shl(ln, 16) | dist
                nt = nt + 1
                ac = ac ^ _shl(ln, 16) ^ dist
                oo = oo + ln
                return (tt2, bb2, oo, ac, nt, stt, eob)

            tt, bb, oo, ac, nt, stt, _ = jax.lax.while_loop(
                grp_cond, grp_body,
                (tt, bb, op, acc, ntok, stat, jnp.int32(0)))
            return tt, bb, oo, ac, nt, stt

        def huff_branch():
            return do_huffman(t, base, op, acc, ntok, btype)

        def stored_branch():
            return do_stored(t, base, op, acc, ntok)

        def bad_branch():
            return t, base, op, acc, ntok, jnp.int32(BAD_DATA)

        t2, base2, op2, acc2, ntok2, stat = jax.lax.cond(
            btype == 0, stored_branch,
            lambda: jax.lax.cond(btype == 3, bad_branch, huff_branch))

        status = jnp.where(status == OK, stat, status)
        done = jnp.where((final == 1) | (status != OK), 1, 0)
        return (t2, base2, op2, acc2, ntok2, status, final, done)

    t, base, op, acc, ntok, status, final, done = jax.lax.while_loop(
        blk_cond, blk_body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), jnp.int32(OK), jnp.int32(0), jnp.int32(0)))

    status_ref[b] = status
    oplen_ref[b] = op
    acc_ref[b] = acc


@functools.partial(jax.jit,
                   static_argnames=("unroll", "store_tokens", "interpret"))
def tokenize_chunks(comp_words, comp_len, out_len, unroll: int = 1,
                    store_tokens: bool = False, interpret: bool = False):
    B, W = comp_words.shape
    W_pad = -(-W // 1024) * 1024
    cw = comp_words.astype(jnp.int32)
    if W_pad != W:
        cw = jnp.pad(cw, ((0, 0), (0, W_pad - W)))
    cw = cw.reshape(B * W_pad)

    status, oplens, accs = pl.pallas_call(
        functools.partial(_tok_kernel, W=W_pad, unroll=unroll,
                          store_tokens=store_tokens),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STAGE_W,), jnp.int32),
            pltpu.SMEM((LL_SIZE,), jnp.int32),
            pltpu.SMEM((OF_SIZE,), jnp.int32),
            pltpu.SMEM((128,), jnp.int32),
            pltpu.SMEM((1184 + 19,), jnp.int32),
            pltpu.SMEM((1184,), jnp.int32),
            pltpu.SMEM((2048,), jnp.int32),      # token buffer
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(comp_len.astype(jnp.int32), out_len.astype(jnp.int32),
      jnp.asarray(_CONSTS), cw)
    return status, oplens, accs


def class_streams(cls: str, nmb: int = 16):
    import bench as benchmod

    CH = 1 << 20
    corpus = benchmod.make_corpus(16)
    u = len(corpus) // 8
    spans = {"text": (0, 2 * u), "skew": (2 * u, 4 * u),
             "recs": (4 * u, 6 * u), "rand": (6 * u, 7 * u),
             "runs": (7 * u, 8 * u), "mixed": (0, 8 * u)}
    lo, hi = spans[cls]
    data = corpus[lo:hi]
    nch = max(len(data) // CH, 1)
    chunks = [data[i * CH:(i + 1) * CH] for i in range(nch)]
    streams = []
    for ch in chunks:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        streams.append(co.compress(ch) + co.flush())
    return chunks, streams


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:
        names = ["tok1", "tok4", "tokst"]
    cls_list = (["text", "skew", "recs", "runs", "mixed"]
                if "--cls" not in sys.argv
                else [sys.argv[sys.argv.index("--cls") + 1]])

    cfg = {"tok1": (1, False), "tok2": (2, False), "tok4": (4, False),
           "tok8": (8, False), "tokst": (1, True), "tokst4": (4, True)}

    for cls in cls_list:
        chunks, streams = class_streams(cls)
        maxw = max(-(-len(s) // 4) for s in streams) + 2 * STAGE_W
        B = len(streams)
        comp = np.zeros((B, maxw), np.uint32)
        clen = np.zeros(B, np.int32)
        olen = np.zeros(B, np.int32)
        for i, s in enumerate(streams):
            pad = (-len(s)) % 4
            comp[i, : (len(s) + pad) // 4] = np.frombuffer(
                s + b"\0" * pad, np.uint32)
            clen[i] = len(s)
            olen[i] = len(chunks[i])
        total = int(olen.sum())
        cw = jax.device_put(jnp.asarray(comp))
        cl = jax.device_put(jnp.asarray(clen))
        ol = jax.device_put(jnp.asarray(olen))

        line = [f"{cls:5s} ({total >> 20} MiB)"]
        for name in names:
            u_, st_ = cfg[name]
            fn = lambda: jax.tree.map(
                np.asarray, tokenize_chunks(cw, cl, ol, unroll=u_,
                                            store_tokens=st_))
            status, oplens, accs = fn()
            okc = (np.asarray(status) == 0).all() and \
                (np.asarray(oplens) == olen).all()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            line.append(f"{name}={total/dt/1e6:6.1f} MB/s"
                        f"{'' if okc else ' MISMATCH'}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
