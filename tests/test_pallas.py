"""Pallas kernel tests (interpret mode on CPU; same code compiles on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from muscato_tpu.ops import fused
from muscato_tpu.ops import pallas_windows as pw


@pytest.mark.parametrize("width,min_dinuc", [(8, 0), (8, 3), (20, 3), (4, 1)])
def test_pallas_window_queries_match_xla(width, min_dinuc):
    rng = np.random.default_rng(width * 10 + min_dinuc)
    nreads, lmax = 700, 128  # deliberately not a tile multiple
    codes = rng.integers(0, 5, (nreads, lmax)).astype(np.uint8)
    lengths = rng.integers(0, lmax + 1, nreads).astype(np.int32)
    for i in range(nreads):
        codes[i, lengths[i]:] = 0
    q1s = (0, 10, 40)

    k1_x, k2_x, v_x = fused._window_queries_codes(
        jnp.asarray(codes), jnp.asarray(lengths),
        jnp.asarray(np.array(q1s, np.int32)),
        width=width, min_dinuc=min_dinuc,
    )
    k1_p, k2_p, v_p = pw.window_queries_pallas(
        jnp.asarray(codes), jnp.asarray(lengths), q1s,
        width=width, min_dinuc=min_dinuc,
    )
    v_x = np.asarray(v_x)
    np.testing.assert_array_equal(v_x, np.asarray(v_p))
    # Keys only need to agree where the query is valid.
    np.testing.assert_array_equal(np.asarray(k1_x)[v_x], np.asarray(k1_p)[v_x])
    np.testing.assert_array_equal(np.asarray(k2_x)[v_x], np.asarray(k2_p)[v_x])


def test_muscato_pallas_env_wired(monkeypatch):
    """MUSCATO_PALLAS=1 must actually route match_windows through the
    Pallas window-extraction kernel with unchanged survivors."""
    import numpy as np
    import jax.numpy as jnp
    from muscato_tpu.engine.index import build_target_index
    from muscato_tpu.io import seqcodec
    from muscato_tpu.io.targets import TargetSet
    from muscato_tpu.ops import fused, packed as pops
    from muscato_tpu.ops import verify as vops

    rng = np.random.default_rng(3)
    genes = ["".join("ACGT"[i] for i in rng.integers(0, 4, 256)) for _ in range(8)]
    reads = [g[o : o + 40] for g in genes for o in (0, 50, 100)]
    codes, lengths = seqcodec.encode_rows([r.encode() for r in reads], 64)
    gene_start = np.arange(9, dtype=np.int64) * 256
    ts = TargetSet(
        tcat=np.concatenate([seqcodec.encode(g.encode()) for g in genes]),
        gene_start=gene_start,
        names=[b"g%d" % i for i in range(8)],
        lengths=np.diff(gene_start),
    )
    width, max_rl = 8, 64
    idx = build_target_index(ts, width)
    codes_j = jnp.asarray(codes)
    args = (pops.pack_rows(codes_j), jnp.asarray(lengths),
            jnp.asarray(np.array([0, 6], np.int32)),
            idx.skeys, idx.spos, idx.tpacked, idx.gene_start,
            jnp.asarray(vops.mismatch_budget_table(0.9, max_rl)))
    kw = dict(width=width, min_dinuc=1, max_read_length=max_rl,
              pair_chunk=1 << 10, surv_cap=1 << 12, smax=idx.num_bases)

    buf_a, n_a, t_a, _ = fused.match_windows(*args, **kw)
    monkeypatch.setenv("MUSCATO_PALLAS", "1")
    buf_b, n_b, t_b, _ = fused.match_windows(*args, **kw)
    assert int(n_a) == int(n_b) and int(t_a) == int(t_b)
    rows_a = {tuple(r) for r in np.asarray(buf_a)[: int(n_a)].tolist()}
    rows_b = {tuple(r) for r in np.asarray(buf_b)[: int(n_b)].tolist()}
    assert rows_a == rows_b and int(n_a) > 0
