"""Round-5 diagnostic: decompose the corpus2-text ratio gap (device lean
vs libdeflate -6) into parse loss vs entropy-coding loss.

The native engine at L6 is ratio-parity with the reference, so its
stream on a text chunk is the target.  Compare per-chunk:
  - stream statistics from the DEFLATE token stream itself (decode both
    streams' items with a python tokenizer): #blocks, #literals,
    #matches, match-byte coverage, len/dist histogram summaries,
    symbol-cost split (litlen bits, dist bits, extra bits, header bits).
Run: JAX_PLATFORMS=cpu python scripts/exp_text_gap_diag.py [nchunks]
"""
from __future__ import annotations

import sys
import zlib

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from bench import CHUNK, make_corpus2


LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35,
            43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
             4, 4, 4, 4, 5, 5, 5, 5, 0]
OFF_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
            257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193,
            12289, 16385, 24577]
OFF_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
             9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
PERM = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


class _BR:
    def __init__(self, data):
        self.d, self.pos, self.buf, self.n = data, 0, 0, 0

    def need(self, k):
        while self.n < k:
            b = self.d[self.pos] if self.pos < len(self.d) else 0
            self.pos += 1
            self.buf |= b << self.n
            self.n += 8

    def take(self, k):
        self.need(k)
        v = self.buf & ((1 << k) - 1)
        self.buf >>= k
        self.n -= k
        return v

    def bitpos(self):
        return self.pos * 8 - self.n


def _mkdec(lens):
    """(code, len) -> sym decode dict keyed by (len, code)."""
    out = {}
    code = 0
    for l in range(1, 16):
        for s, ln in enumerate(lens):
            if ln == l:
                out[(l, code)] = s
                code += 1
        code <<= 1
    return out


def _dsym(br, dec):
    code = 0
    for l in range(1, 16):
        code = (code << 1) | br.take(1)
        if (l, code) in dec:
            return dec[(l, code)], l
    raise ValueError("bad code")


def tokenize(stream: bytes):
    """Yield ('block', hdr_bits) / ('lit', sym_bits) /
    ('match', len, dist, sym_bits, extra_bits) for a raw DEFLATE stream."""
    br = _BR(stream)
    while True:
        if br.pos >= len(br.d):       # ran off the stream (non-final chunk)
            return
        h0 = br.bitpos()
        final = br.take(1)
        btype = br.take(2)
        if btype == 0:
            br.need((8 - (br.bitpos() & 7)) & 7)
            br.take((8 - (br.bitpos() & 7)) & 7)
            ln = br.take(16)
            br.take(16)
            yield ("block", br.bitpos() - h0)
            for _ in range(ln):
                br.take(8)
                yield ("lit", 8)
        else:
            if btype == 1:
                ll = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
                dl = [5] * 30
            else:
                hlit = br.take(5) + 257
                hdist = br.take(5) + 1
                hclen = br.take(4) + 4
                plens = [0] * 19
                for i in range(hclen):
                    plens[PERM[i]] = br.take(3)
                pdec = _mkdec(plens)
                lens = []
                while len(lens) < hlit + hdist:
                    s, _ = _dsym(br, pdec)
                    if s < 16:
                        lens.append(s)
                    elif s == 16:
                        r = 3 + br.take(2)
                        lens += [lens[-1]] * r
                    elif s == 17:
                        lens += [0] * (3 + br.take(3))
                    else:
                        lens += [0] * (11 + br.take(7))
                ll, dl = lens[:hlit], lens[hlit:]
            ldec, ddec = _mkdec(ll), _mkdec(dl)
            yield ("block", br.bitpos() - h0)
            while True:
                s, sb = _dsym(br, ldec)
                if s < 256:
                    yield ("lit", sb)
                elif s == 256:
                    break
                else:
                    sl = s - 257
                    eb = LEN_EXTRA[sl]
                    ln = LEN_BASE[sl] + br.take(eb)
                    ds, dsb = _dsym(br, ddec)
                    deb = OFF_EXTRA[ds]
                    dist = OFF_BASE[ds] + br.take(deb)
                    yield ("match", ln, dist, sb + dsb, eb + deb)
        if final:
            return


def stream_stats(stream: bytes):
    """(nblocks, nlit, nmatch, match_bytes, sym_bits, extra_bits,
    hdr_bits, len_hist_summary, dist_summary)."""
    stats = dict(blocks=0, lits=0, matches=0, mbytes=0, sym_bits=0,
                 extra_bits=0, hdr_bits=0, len_sum=0, dist_log_sum=0.0,
                 len3=0, len4_8=0, len9_32=0, len33p=0)
    for tok in tokenize(stream):
        kind = tok[0]
        if kind == "block":
            stats["blocks"] += 1
            stats["hdr_bits"] += tok[1]
        elif kind == "lit":
            stats["lits"] += 1
            stats["sym_bits"] += tok[1]
        elif kind == "match":
            ln, dist, sbits, ebits = tok[1], tok[2], tok[3], tok[4]
            stats["matches"] += 1
            stats["mbytes"] += ln
            stats["sym_bits"] += sbits
            stats["extra_bits"] += ebits
            stats["len_sum"] += ln
            stats["dist_log_sum"] += float(np.log2(max(dist, 1)))
            if ln == 3:
                stats["len3"] += 1
            elif ln <= 8:
                stats["len4_8"] += 1
            elif ln <= 32:
                stats["len9_32"] += 1
            else:
                stats["len33p"] += 1
    return stats


def main():
    nch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    corpus = make_corpus2()
    u = len(corpus) // 10
    text = corpus[: 4 * u]
    chunks = [text[i * CHUNK:(i + 1) * CHUNK] for i in range(nch)]

    from libdeflate_tpu import api
    from libdeflate_tpu.compress import tpu_optimal as to
    from libdeflate_tpu.compress.tpu_pipeline import device_stream_to_bytes

    comp6 = api.Compressor(6)

    from libdeflate_tpu.compress.tpu_dynamic import emit_dynamic_block

    def one(b, l, f):
        bp, pos, cm, cl, eff, dist = to.parse_chunk_optimal(
            b, l, depth=6, two_pass=False, hash3=False, wide_window=True,
            passes=1, use_content=False, use_wide=False,
            ladder=to.LEN_LADDER_DENSE2, ext_c=False, strides2=())
        return emit_dynamic_block(bp, f, cm, cl, eff, dist, b.shape[0],
                                  bp.shape[0], refine_passes=0)

    lean = jax.jit(jax.vmap(one))

    for k, ch in enumerate(chunks):
        nat = bytes(comp6.deflate_compress(ch))
        b = jnp.asarray(np.frombuffer(ch, np.uint8)[None, :])
        w, t = lean(b, jnp.full(1, len(ch), jnp.int32),
                    jnp.zeros(1, bool))
        dev = device_stream_to_bytes(np.asarray(w[0]), np.asarray(t[0]))
        assert zlib.decompressobj(-15).decompress(dev) == ch

        sn = stream_stats(nat)
        sd = stream_stats(dev)
        print(f"chunk {k}: native {len(nat)} B vs device {len(dev)} B "
              f"({(len(dev)-len(nat))/CHUNK*100:+.3f}pp)", flush=True)
        for tag, s in (("native-L6", sn), ("device-lean", sd)):
            cov = s["mbytes"] / CHUNK * 100
            avl = s["len_sum"] / max(s["matches"], 1)
            avd = s["dist_log_sum"] / max(s["matches"], 1)
            print(f"  {tag:12s} blocks={s['blocks']:3d} "
                  f"hdr={s['hdr_bits']/8:7.0f}B "
                  f"lits={s['lits']:7d} matches={s['matches']:7d} "
                  f"cover={cov:5.1f}% avglen={avl:5.1f} "
                  f"avglog2d={avd:4.1f}", flush=True)
            print(f"               len3={s['len3']} len4-8={s['len4_8']} "
                  f"len9-32={s['len9_32']} len33+={s['len33p']} "
                  f"symB={s['sym_bits']//8} extraB={s['extra_bits']//8}",
                  flush=True)


if __name__ == "__main__":
    main()
