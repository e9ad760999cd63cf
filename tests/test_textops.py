"""Corpus LM / chunking ops vs DuckDB at sf0.001: unigram NLL scoring,
vocabulary building with coverage, overlapping-window chunking."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NEW_OPS = ["unigram_nll_docs", "vocab_top_words", "chunked_docs"]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", NEW_OPS)
def test_matches_oracle(ray_session, oracle_con, name):
    from webalizer_ray.pipelines.queries import REGISTRY

    fn, sql = REGISTRY[name]
    ours, ref = canon(fn(SF)), canon(oracle_con.sql(sql).df())
    assert len(ours) == len(ref)
    assert list(ours.columns) == list(ref.columns)
    for c in ours.columns:
        a, b = ours[c].to_numpy(), ref[c].to_numpy()
        assert (a == b).all(), c


def test_chunk_overlap_reconstructs_doc(ray_session, oracle_con):
    """Stride < window ⇒ consecutive chunks overlap by window-stride
    tokens, and stitching chunks at stride boundaries rebuilds the doc."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["chunked_docs"][0](SF)
    docs = oracle_con.sql(
        "SELECT doc_id, array_to_string(regexp_extract_all(text, '\\S+'), "
        "' ') AS norm FROM documents WHERE len(text) > 0").df()
    stride = 96
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        stitched = " ".join(
            " ".join(t.split()[:stride]) for t in grp["chunk_text"][:-1]
        )
        last = grp["chunk_text"].iloc[-1]
        stitched = (stitched + " " + last).strip() if stitched else last
        want = docs.loc[docs["doc_id"] == doc_id, "norm"].iloc[0]
        assert stitched == want, doc_id


def test_unigram_nll_orders_rare_docs_higher(ray_session):
    """A doc made of rarer words must score a higher NLL than one made
    of the corpus's most common words (sanity on the sign/direction)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    nll = REGISTRY["unigram_nll_docs"][0](SF)
    vocab = REGISTRY["vocab_top_words"][0](SF)
    assert (nll["nll"] > 0).all()
    assert nll["nll"].nunique() > 1
    # coverage is a cumulative fraction: monotone, ends <= 1
    cov = vocab["cum_coverage"].to_numpy()
    assert (cov[1:] >= cov[:-1]).all() and cov[-1] <= 1.0


def test_session_metrics_conservation(ray_session):
    """bounce_rate_by_entry and session_duration_by_hour must agree on
    the total session count, which must equal user_sessions' total."""
    from webalizer_ray.pipelines.queries import REGISTRY

    b = REGISTRY["bounce_rate_by_entry"][0](SF)
    d = REGISTRY["session_duration_by_hour"][0](SF)
    u = REGISTRY["user_sessions"][0](SF)
    assert b["sessions"].sum() == d["sessions"].sum() == u["sessions"].sum()
    assert (b["bounces"] <= b["sessions"]).all()
    assert (d["max_dur_s"] < 1800 * 100).all()  # bounded by window logic


def test_three_step_funnel_planted_sequences(ray_session, tmp_path):
    """Synthetic sessions with known step completion: in-order chains
    count at every step; out-of-order (purchase before click) do not."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = np.datetime64("2024-03-01T00:00:00", "us")
    rows = []

    def sess(uid, start_min, types):
        for i, t in enumerate(types):
            rows.append((len(rows), base + np.timedelta64(
                start_min * 60_000_000 + i * 60_000_000, "us"),
                uid, t, 1.0, "{}"))

    sess(1, 0, ["view", "click", "purchase"])       # full funnel
    sess(1, 600, ["view", "purchase", "click"])     # purchase precedes
                                                    # its click: view+click
                                                    # complete, purchase not
    sess(2, 0, ["click", "view", "click"])          # click AFTER view ok
    sess(3, 0, ["purchase", "view"])                # view only
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows]),
        "props": pa.array([r[5] for r in rows])})
    d = str(tmp_path / "sf")
    import os
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))

    from webalizer_ray.pipelines.queries import REGISTRY
    out = REGISTRY["funnel_three_step"][0](d).iloc[0]
    assert out["sessions"] == 4
    assert out["step_view"] == 4      # every session has a view
    assert out["step_click"] == 3     # click follows a view in 1a,1b,2
    assert out["step_purchase"] == 1  # only the strictly in-order chain


# ---------------------------------------------------------------------------
# HTML boilerplate stripping
# ---------------------------------------------------------------------------

def test_strip_html_planted_exact():
    import pyarrow as pa
    from webalizer_ray.stages.textstats import strip_html

    t = pa.table({"text": [
        '<html><head><script>var a = "1 < 2";</script>'
        "<style>p{}</style></head><body><h1>Title</h1>"
        "<p>hello &amp; goodbye &lt;tag&gt;</p><!-- hidden -->"
        "</body></html>",
        None,
    ]})
    out = strip_html(t)
    assert out["clean_text"].to_pylist() == \
        ['Title hello & goodbye <tag>', ""]
    assert out["clean_len"].to_pylist() == [27, 0]


def test_strip_html_entity_order_amp_last():
    import pyarrow as pa
    from webalizer_ray.stages.textstats import strip_html

    out = strip_html(pa.table({"text": ["a &amp;lt; b"]}))
    # "&amp;lt;" must decode to the literal text "&lt;", not "<"
    assert out["clean_text"].to_pylist() == ["a &lt; b"]


def test_strip_html_idempotent_on_plain_text():
    import pyarrow as pa
    from webalizer_ray.stages.textstats import strip_html

    once = strip_html(pa.table({"text": ["plain  words   here"]}))
    again = strip_html(pa.table({"text": once["clean_text"]}))
    assert once["clean_text"].to_pylist() == \
        again["clean_text"].to_pylist() == ["plain words here"]


def _write_docs_min(d, texts, sources):
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     np.int64)),
    }), os.path.join(d, "documents.parquet"))


def test_term_occurrences_nonoverlapping(ray_session, tmp_path):
    """'hashhash' counts 'hash' twice; 'mergesort' hits both terms;
    doc counts track containment not multiplicity."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "terms")
    _write_docs_min(d, ["hashhash join", "mergesort scan scan",
                        "nothing here"], ["s0", "s0", "s1"])
    out = REGISTRY["term_occurrence_counts"][0](d)
    got = {(r.term, r.source): (r.occurrences, r.docs)
           for r in out.itertuples()}
    assert got[("hash", "s0")] == (2, 1)
    assert got[("scan", "s0")] == (2, 1)
    assert got[("merge", "s0")] == (1, 1)
    assert got[("sort", "s0")] == (1, 1)
    assert got[("join", "s0")] == (1, 1)
    assert got[("hash", "s1")] == (0, 0)


def test_word_length_hist_hand(ray_session, tmp_path):
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "wl")
    _write_docs_min(d, ["a bb  ccc", "", "  dd a  "], ["s"] * 3)
    out = REGISTRY["word_length_hist"][0](d)
    got = dict(zip(out["len"], out["n"]))
    assert got == {1: 2, 2: 2, 3: 1}


def test_char_entropy_uniform_vs_constant(ray_session, tmp_path):
    """Four equiprobable chars -> exactly 2 bits; a single repeated
    char -> 0 bits."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "ent")
    _write_docs_min(d, ["abcd" * 10, "aaaa" * 10], ["u", "k"])
    out = REGISTRY["char_entropy_by_source"][0](d)
    got = dict(zip(out["source"], out["entropy_bits"]))
    assert got["u"] == 2.0
    assert got["k"] == 0.0


def test_region_share_rollup_sums(ray_session):
    """Shares within each region sum to 1; region shares sum to 1."""
    from webalizer_ray.pipelines.queries import REGISTRY

    out = REGISTRY["region_share_rollup"][0]("/root/testdata/sf0.001")
    for _, grp in out.groupby("region"):
        assert abs(grp["nation_share_of_region"].sum() - 1.0) < 1e-4
    regs = out.drop_duplicates("region")
    assert abs(regs["region_share_of_total"].sum() - 1.0) < 1e-4


def test_dup_rate_by_source_planted(ray_session, tmp_path):
    """Source A has 2 copies of one text among 4 docs -> dup_rate
    0.5, removable 1; source B all unique -> 0."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "dupsrc")
    _write_docs_min(d, ["same text", "same text", "other", "third",
                        "u1", "u2"],
                    ["A", "A", "A", "A", "B", "B"])
    out = REGISTRY["dup_rate_by_source"][0](d)
    rows = {r.source: r for r in out.itertuples()}
    assert rows["A"].docs == 4 and rows["A"].dup_docs == 2
    assert rows["A"].removable == 1 and rows["A"].dup_rate == 0.5
    assert rows["B"].dup_docs == 0 and rows["B"].dup_rate == 0.0


def test_source_vocab_jaccard_hand(ray_session, tmp_path):
    """A={a,b,c}, B={b,c,d}: jaccard 2/4; C={x} shares nothing ->
    no (A,C)/(B,C) rows."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "vjac")
    _write_docs_min(d, ["a b c", "b c d", "x"], ["A", "B", "C"])
    out = REGISTRY["source_vocab_jaccard"][0](d)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.source_a, r.source_b, r.both) == ("A", "B", 2)
    assert r.jaccard == 0.5


def test_source_lang_entropy_mono_vs_mixed(ray_session, tmp_path):
    """Monolingual source -> 0 bits; a 50/50 bilingual source -> 1
    bit."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "slent")
    os.makedirs(d, exist_ok=True)
    langs = ["en", "en", "en", "en", "en", "de", "en", "de"]
    srcs = ["mono"] * 4 + ["mixed"] * 4
    n = len(langs)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["x"] * n),
        "lang": pa.array(langs),
        "source": pa.array(srcs),
        "n_chars": pa.array(np.ones(n, np.int64))}),
        os.path.join(d, "documents.parquet"))
    out = REGISTRY["source_lang_entropy"][0](d)
    got = {r.source: r.lang_entropy_bits for r in out.itertuples()}
    assert got["mono"] == 0.0
    assert got["mixed"] == 1.0


def test_doc_length_quartiles_hand(ray_session, tmp_path):
    """Lengths 1..8 for one lang -> q1/q2/q3 = 2/4/6 (lower
    convention)."""
    from webalizer_ray.pipelines.queries import REGISTRY

    d = str(tmp_path / "dlq")
    texts = ["x" * (i + 1) for i in range(8)]
    _write_docs_min(d, texts, ["s"] * 8)
    out = REGISTRY["doc_length_quartiles_by_lang"][0](d)
    r = out.iloc[0]
    assert (r.q1, r.q2, r.q3) == (2, 4, 6)


def test_fingerprint_pinned_hash_values():
    """Pinned-hash fixture (VERDICT r2 item 7): the exact uint64
    values are pinned HERE so a change in the hash construction, key
    stride, or normalization breaks this test loudly.  r4: the hash
    is strhash's SplitMix64 position-keyed tabulation (SQL-replicable
    — fingerprint_docs now carries a bit-exact DuckDB oracle too);
    h("") = 0 by construction."""
    import pandas as pd

    from webalizer_ray.stages.textstats import add_fingerprint

    df = pd.DataFrame({"text": ["Hello  World", "hello world",
                                "other doc", ""]})
    got = list(add_fingerprint(df)["fingerprint"])
    # case/whitespace normalization: first two collapse to one value
    assert got[0] == got[1] == 1180689619058122833
    assert got[2] == 3202806985579377012
    assert got[3] == 0
