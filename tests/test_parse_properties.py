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
