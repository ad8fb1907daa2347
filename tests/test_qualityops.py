"""Quality operators: Gopher rule filter, TF-IDF top terms, CCNet-style
chunk dedup (both paths), HLL distinct sketch, events funnel
(pipelines/qualityops.py, pipelines/events.py)."""
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _doc_texts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))


def test_gopher_filter_matches_serial_rules(ray_session):
    from collections import Counter

    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.functions.textstats import (
        STOPWORDS,
        _PUNCT_RE,
    )
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOP,
        GOPHER_MIN_WORDS,
        gopher_filter,
    )

    df = gopher_filter(SF).to_pandas().set_index("doc_id").sort_index()
    texts = _doc_texts()
    assert len(df) == len(texts)
    for doc_id, text in list(texts.items())[:200]:
        toks = tokenize_ws(text)
        grams = Counter(
            toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)
        )
        n_g = sum(grams.values())
        mask = 0
        if not (GOPHER_MIN_WORDS <= len(toks) <= GOPHER_MAX_WORDS):
            mask |= 1
        sl = sum(len(w) for w in toks)
        if toks and not (
            GOPHER_MIN_MWL * len(toks) <= sl <= GOPHER_MAX_MWL * len(toks)
        ):
            mask |= 2
        if text and 10 * len(_PUNCT_RE.findall(text)) > len(text):
            mask |= 4
        if sum(1 for w in toks if w.lower() in STOPWORDS) < GOPHER_MIN_STOP:
            mask |= 8
        if n_g and 10 * (n_g - len(grams)) > 3 * n_g:
            mask |= 16
        if n_g and 5 * max(grams.values()) > n_g:
            mask |= 32
        row = df.loc[doc_id]
        assert row["fail_mask"] == mask, doc_id
        assert row["keep"] == (1 if mask == 0 else 0)
        assert row["n_words"] == len(toks)
    # the synthetic corpus produces both kept and dropped docs
    assert 0 < df["keep"].sum() < len(df)


def test_tfidf_topterms_ranking(ray_session):
    from collections import Counter

    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        TFIDF_TOPK,
        tfidf_topterms,
    )

    df = tfidf_topterms(SF).to_pandas()
    # broadcast and join paths produce identical rows
    dfj = tfidf_topterms(SF, broadcast_max_types=0).to_pandas()
    key = ["doc_id", "rnk"]
    assert (
        df.sort_values(key).reset_index(drop=True)
        .equals(dfj.sort_values(key).reset_index(drop=True))
    )
    texts = _doc_texts()
    # global df counts docs containing the term
    expect_df = Counter()
    for text in texts.values():
        expect_df.update(set(tokenize_ws(text)))
    assert (df.groupby("doc_id")["rnk"].max() <= TFIDF_TOPK).all()
    for doc_id, g in list(df.groupby("doc_id"))[:100]:
        toks = Counter(tokenize_ws(texts[doc_id]))
        ranked = sorted(
            toks.items(), key=lambda kv: (-kv[1], expect_df[kv[0]], kv[0])
        )[:TFIDF_TOPK]
        g = g.sort_values("rnk")
        assert list(g["term"]) == [t for t, _ in ranked], doc_id
        assert list(g["tf"]) == [c for _, c in ranked]
        assert list(g["df"]) == [expect_df[t] for t, _ in ranked]


def test_line_dedup_paths_agree(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        line_dedup,
    )

    a = (
        line_dedup(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        line_dedup(SF, broadcast_max_types=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # exact copies (doc_id + 2e6) duplicate every chunk of their original
    from web_content_extraction_benchmark_ray.pipelines.dataops import (
        EXACT_COPY_EVERY,
        EXACT_COPY_OFFSET,
    )

    ax = a.set_index("doc_id")
    copies = [i for i in ax.index if i >= EXACT_COPY_OFFSET]
    assert copies
    for c in copies[:20]:
        orig = c - EXACT_COPY_OFFSET
        assert ax.loc[c, "n_dup"] == ax.loc[c, "n_chunks"]
        assert ax.loc[orig, "n_dup"] == ax.loc[orig, "n_chunks"]
    # originals without a copy mostly keep everything
    never = [
        i
        for i in ax.index
        if i < EXACT_COPY_OFFSET // 2 and i % EXACT_COPY_EVERY != 0
    ]
    frac_clean = np.mean([ax.loc[i, "n_dup"] == 0 for i in never])
    assert frac_clean > 0.5


def test_distinct_sketch_matches_serial_hll(ray_session):
    from web_content_extraction_benchmark_ray.functions.hashing import (
        hash60,
        shingles,
    )
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        HLL_M,
        HLL_P,
        _HLL_REM_BITS,
        distinct_sketch,
    )

    df = distinct_sketch(SF).to_pandas().set_index("register").sort_index()
    regs = np.zeros(HLL_M, dtype=np.int64)
    for text in _doc_texts().values():
        for s in shingles(text):
            h = hash60(s)
            rem = h & ((1 << _HLL_REM_BITS) - 1)
            rho = (
                _HLL_REM_BITS + 1
                if rem == 0
                else _HLL_REM_BITS - rem.bit_length() + 1
            )
            r = h >> _HLL_REM_BITS
            regs[r] = max(regs[r], rho)
    nz = np.flatnonzero(regs)
    assert list(df.index) == nz.tolist()
    assert list(df["max_rho"]) == regs[nz].tolist()
    # the HLL estimate folded from the register table should land within
    # 3 standard errors (1.04/sqrt(m)) of the true distinct count
    true = len(
        {hash60(s) for t in _doc_texts().values() for s in shingles(t)}
    )
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(float)))
    if est <= 2.5 * m and (regs == 0).sum() > 0:
        est = m * np.log(m / (regs == 0).sum())
    assert abs(est - true) / true < 3 * 1.04 / np.sqrt(m)


def test_bm25_score_matches_serial_formula(ray_session):
    from collections import Counter

    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        BM25_TERMS,
        bm25_score,
    )

    df = bm25_score(SF).to_pandas().set_index("doc_id").sort_index()
    texts = _doc_texts()
    toks = {i: tokenize_ws(t) for i, t in texts.items()}
    n_docs = len(toks)
    total = sum(len(v) for v in toks.values())
    dfs = {
        term: sum(1 for v in toks.values() if term in v)
        for term in BM25_TERMS
    }
    for doc_id in list(texts)[:150]:
        tl = toks[doc_id]
        c = Counter(tl)
        s = 0
        for term in BM25_TERMS:
            tf, dfx = c.get(term, 0), dfs[term]
            if tf and dfx:
                idf = (n_docs // dfx).bit_length()
                s += (idf * 4 * tf * total * 1_000_000) // (
                    2 * tf * total + total + len(tl) * n_docs
                )
        assert df.loc[doc_id, "score_mu"] == s, doc_id
        assert df.loc[doc_id, "dl"] == len(tl)
    # docs containing a query term outscore those containing none
    assert df["score_mu"].max() > 0
    assert (df["score_mu"] >= 0).all()


def test_cooccur_topk_matches_serial_count(ray_session):
    from collections import Counter

    from web_content_extraction_benchmark_ray.functions.text import tokenize_ws
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        COOCCUR_C,
        COOCCUR_K,
        cooccur_topk,
    )

    got = cooccur_topk(SF).to_pandas()
    c: Counter = Counter()
    for t in _doc_texts().values():
        toks = tokenize_ws(t)
        for d in range(1, COOCCUR_C + 1):
            for x, y in zip(toks, toks[d:]):
                if x != y:
                    c[(x, y) if x < y else (y, x)] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:COOCCUR_K]
    got = got.sort_values(["n", "a", "b"], ascending=[False, True, True])
    assert [tuple(r) for r in got[["a", "b"]].values] == [
        p for p, _ in want
    ]
    assert list(got["n"]) == [n for _, n in want]


def test_distinct_by_source_is_groupwise_sketch(ray_session):
    from web_content_extraction_benchmark_ray.functions.hashing import (
        hash60,
        shingles,
    )
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        HLL_M,
        _HLL_REM_BITS,
        distinct_by_source,
    )
    import pyarrow.parquet as _pq

    df = (
        distinct_by_source(SF)
        .to_pandas()
        .set_index(["source", "register"])
        .sort_index()
    )
    t = _pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    )
    regs: dict = {}
    for src, text in zip(
        t.column("source").to_pylist(), t.column("text").to_pylist()
    ):
        r = regs.setdefault(src, np.zeros(HLL_M, dtype=np.int64))
        for s in shingles(text):
            h = hash60(s)
            rem = h & ((1 << _HLL_REM_BITS) - 1)
            rho = (
                _HLL_REM_BITS + 1
                if rem == 0
                else _HLL_REM_BITS - rem.bit_length() + 1
            )
            i = h >> _HLL_REM_BITS
            r[i] = max(r[i], rho)
    want = {
        (src, int(i)): int(r[i])
        for src, r in regs.items()
        for i in np.flatnonzero(r)
    }
    assert dict(zip(df.index, df["max_rho"])) == want


def test_events_funnel_matches_serial_scan(ray_session):
    from web_content_extraction_benchmark_ray.pipelines.events import (
        FUNNEL_STEPS,
        events_funnel,
    )

    df = events_funnel(SF).to_pandas().set_index("user_id").sort_index()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "user_id", "event_type"]
    ).to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    assert len(df) == ev["user_id"].nunique()
    for uid, g in list(ev.groupby("user_id"))[:60]:
        g = g.sort_values("us")
        prev, got = None, []
        for step in FUNNEL_STEPS:
            sel = g[g["event_type"] == step]
            if prev is not None:
                sel = sel[sel["us"] > prev]
            t = int(sel["us"].iloc[0]) if len(sel) else None
            got.append(t)
            prev = t if t is not None else np.iinfo(np.int64).max
        row = df.loc[uid]
        for col, want in zip(("t1_us", "t2_us", "t3_us"), got):
            if want is None:
                assert np.isnan(row[col]), (uid, col)
            else:
                assert row[col] == want, (uid, col)
        depth = 0
        for t in got:
            if t is None:
                break
            depth += 1
        assert row["depth"] == depth


def test_length_quantiles_matches_serial_selection(ray_session):
    """Integer-index selection per source must equal a single-process
    sort + index pick."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.text import (
        tokenize_ws,
    )
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        LENGTH_PCTS,
        length_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    df = length_quantiles(sf).to_pandas()
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    docs["n_tokens"] = docs["text"].map(lambda s: len(tokenize_ws(s)))
    expect = {}
    for src, g in docs.groupby("source"):
        tok = np.sort(g["n_tokens"].to_numpy())
        for p in LENGTH_PCTS:
            expect[(src, p)] = int(tok[(p * (len(tok) - 1)) // 100])
    assert len(df) == len(expect)
    for _, row in df.iterrows():
        assert row["n_tokens_q"] == expect[(row["source"], row["pct"])]
    # percentiles are monotone within a source
    for _, g in df.groupby("source"):
        vals = g.sort_values("pct")["n_tokens_q"].tolist()
        assert vals == sorted(vals)


def test_score_correlation_matches_serial_pearson(ray_session):
    """Distributed sufficient statistics must reproduce a single-process
    exact-integer Pearson, and corr6 stays inside [-1e6, 1e6]."""
    import math

    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.textstats import (
        quality_features,
    )
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        score_correlation,
    )

    sf = "/root/testdata/sf0.001"
    df = score_correlation(sf).to_pandas().set_index("source")
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    for src, g in docs.groupby("source"):
        qs, ls = [], []
        for t in g["text"]:
            qf = quality_features(t)
            qs.append(int(round(qf["quality"] * 1e6)))
            ls.append(qf["n_ws"])
        n = len(qs)
        sq, sl = sum(qs), sum(ls)
        sqq = sum(q * q for q in qs)
        sll = sum(x * x for x in ls)
        sql = sum(q * x for q, x in zip(qs, ls))
        va, vb = n * sqq - sq * sq, n * sll - sl * sl
        corr6 = (
            int(math.floor(1e6 * (float(n * sql - sq * sl)
                / (math.sqrt(float(va)) * math.sqrt(float(vb)))) + 0.5))
            if va > 0 and vb > 0 else 0
        )
        assert df.loc[src, "n"] == n
        assert df.loc[src, "corr6"] == corr6
        assert -1_000_000 <= corr6 <= 1_000_000


def test_source_overlap_matches_serial_bottom_k(ray_session):
    """The distributed bottom-k sketch estimate equals a serial
    recomputation from raw shingle sets for every source pair, and the
    estimator's invariants hold (n_inter <= k_union <= k)."""
    import pyarrow.parquet as pq

    from web_content_extraction_benchmark_ray.functions.hashing import (
        hash60,
        shingles,
    )
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        SRC_SKETCH_K,
        source_overlap,
    )

    df = source_overlap(SF).to_pandas()
    assert (df["n_inter"] <= df["k_union"]).all()
    assert (df["k_union"] <= SRC_SKETCH_K).all()
    assert ((df["jaccard_est"] >= 0) & (df["jaccard_est"] <= 1)).all()

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "text"])
    per: dict = {}
    for src, text in zip(t.column("source").to_pylist(),
                         t.column("text").to_pylist()):
        per.setdefault(src, set()).update(
            hash60(s) for s in shingles(text)
        )
    sk = {s: np.sort(np.fromiter(v, dtype=np.int64))[:SRC_SKETCH_K]
          for s, v in per.items()}
    assert len(df) == len(per) * (len(per) - 1) // 2
    for row in df.itertuples():
        a, b = sk[row.source_a], sk[row.source_b]
        union = np.union1d(a, b)[:SRC_SKETCH_K]
        inter = int((np.isin(union, a) & np.isin(union, b)).sum())
        assert row.k_union == union.size
        assert row.n_inter == inter


def test_source_overlap_all_empty_source_excluded(ray_session, tmp_path):
    """A source whose docs are all empty/whitespace yields no shingles
    and participates in neither engine — engine and oracle agree on the
    reduced pair universe (regression for the '' shingle divergence)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from web_content_extraction_benchmark_ray.pipelines.qualityops import (
        source_overlap,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "source": pa.array(
                ["a", "a", "b", "b", "empty", "empty"], pa.string()
            ),
            "text": pa.array(
                [
                    "shared words one two three four five",
                    "more shared words one two three four",
                    "shared words one two three four five",
                    "entirely different content in source b here",
                    "",
                    "   ",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    got = source_overlap(str(tmp_path)).to_pandas()
    assert set(got["source_a"]) | set(got["source_b"]) == {"a", "b"}
    assert len(got) == 1

    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"'{tmp_path}/documents.parquet'"
    )
    want = con.sql(e.oracle_sql()["source_overlap"]).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)
