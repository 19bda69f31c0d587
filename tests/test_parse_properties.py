"""Property tests: the FSM commit equals the sequential greedy loop, and
the device Kraft code builder always produces complete decodable codes."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mods():
    import jax.numpy as jnp

    from libdeflate_tpu.compress import tpu_dynamic as td
    from libdeflate_tpu.compress import tpu_pipeline as tp

    return tp, td, jnp


def sequential_commit(span, is_match, seg):
    """The loop the FSM claims to equal: i = seg_start; commit; i += eff."""
    n = len(span)
    committed = np.zeros(n, bool)
    eff = np.ones(n, np.int32)
    for s0 in range(0, n, seg):
        i = s0
        end = s0 + seg
        while i < end:
            committed[i] = True
            trunc = min(span[i], end - i)
            e = trunc if (is_match[i] and trunc >= 3) else 1
            eff[i] = e
            i += e
    return committed, eff


class TestCommitFSM:
    def test_matches_sequential_loop(self, mods, rng):
        tp, td, jnp = mods
        seg = 64
        for trial in range(20):
            n = seg * int(rng.integers(1, 9))
            span = rng.integers(1, 40, n).astype(np.int32)
            is_match = rng.random(n) < 0.4
            span = np.where(is_match, np.maximum(span, 4), 1).astype(np.int32)
            got_c, got_e = tp._greedy_commit(
                jnp.asarray(span), jnp.asarray(is_match), seg
            )
            want_c, want_e = sequential_commit(span, is_match, seg)
            assert np.array_equal(np.asarray(got_c), want_c), trial
            # eff only matters at committed positions
            ge = np.asarray(got_e)
            assert np.array_equal(ge[want_c], want_e[want_c]), trial


class TestKraftCodes:
    def test_complete_and_canonical(self, mods, rng):
        tp, td, jnp = mods
        for trial in range(25):
            kind = trial % 5
            hist = np.zeros(td.NSYM, np.int32)
            if kind == 0:
                hist[:] = rng.integers(0, 1000, td.NSYM)
            elif kind == 1:  # highly skewed
                hist[rng.integers(0, td.NSYM, 5)] = rng.integers(1, 10, 5)
                hist[0] = 1_000_000
            elif kind == 2:  # two symbols
                hist[17] = 3
                hist[255] = 9
            elif kind == 3:  # uniform bytes
                hist[:256] = 100
            else:
                hist[:] = rng.integers(0, 5, td.NSYM)
            hist[256] = max(hist[256], 1)
            if (hist > 0).sum() < 2:
                hist[0] = max(hist[0], 1)
            lens, ok = td._build_code_lens(jnp.asarray(hist), td.NSYM)
            lens = np.asarray(lens)
            assert bool(ok), (trial, "completion failed")
            assert (lens[hist > 0] >= 1).all()
            assert (lens[hist == 0] == 0).all()
            assert lens.max() <= td.MAX_CODE_LEN
            kraft = sum(2.0 ** -l for l in lens if l > 0)
            assert abs(kraft - 1.0) < 1e-9, (trial, kraft)
            # canonical codes must be prefix-free: decode each against all
            table = np.asarray(td._canonical_table(jnp.asarray(lens), td.NSYM))
            seen = set()
            for s in np.nonzero(lens)[0]:
                code, l = table[s] >> 4, table[s] & 15
                assert l == lens[s]
                # reversed codeword padded to l bits must be unique
                assert (code, l) not in seen
                seen.add((code, l))


class TestLiteralCostsOddShapes:
    """Regression (ADVICE r4 medium): _literal_costs must trace for every
    n_pad/sample combination — rows = n_s//65536 does not always divide
    n_s into 128-lane rows (e.g. 832 KiB chunks at sample=4 -> rows=3),
    and tiny chunks give n_s < 128.  The histogram pads with class 256,
    which the [:256] slice drops, so counts stay exact."""

    def _check(self, n_pad, sample, length, rng):
        import jax
        import jax.numpy as jnp

        from libdeflate_tpu.compress import tpu_optimal as topt

        bp = rng.integers(0, 256, size=n_pad, dtype=np.uint8)
        costs, cache = jax.jit(
            lambda b, l: topt._literal_costs(b, l, n_pad, sample=sample)
        )(jnp.asarray(bp), jnp.int32(length))
        costs, cache = np.asarray(costs), np.asarray(cache)
        # exactness: the cache histogram counts the sampled in-range bytes
        samp = bp[::sample][: -(-length // sample) if length else 0]
        # positions i where i*sample < length
        keep = (np.arange(len(bp[::sample])) * sample) < length
        want = np.bincount(bp[::sample][keep].astype(np.int64), minlength=256)
        got = cache.sum(axis=0)[:256]
        assert (got == want).all(), (n_pad, sample, length)
        assert (costs[length:] == 0).all()

    def test_rows3_not_divisible(self, rng):
        # n_s = 212992 -> rows = 3; 212992/128 = 1664 not divisible by 3
        self._check(851968, 4, 851968 - 123, rng)

    def test_tiny_below_lane(self, rng):
        # n_s < 128: must pad up to one full lane row
        self._check(256, 4, 200, rng)
        self._check(512, 4, 512, rng)

    def test_rows2_exact(self, rng):
        # the previously-working power-of-two case stays exact
        self._check(524288, 4, 524288, rng)
