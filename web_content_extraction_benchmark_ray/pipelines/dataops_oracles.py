"""DuckDB oracle SQL for the training-data operators (pipelines/dataops.py).

Every numeric constant and hash construction is generated from the SAME
Python module constants the Ray stages use (functions/hashing.py,
functions/textstats.py), so SQL and Python cannot drift:

- hash60(s)  -> ('0x' || substr(md5(s), 1, 15))::BIGINT
- minhash    -> min((a_i * (h % P) + b_i) % P) with the a_i/b_i VALUES list
                emitted from ``minhash_coeffs()``
- simhash    -> 60-bit sum of sign bits, printed with printf('%015x', v)
- winnowing  -> window min over ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW

Corpus-shape assumptions (hold for the driver's synthetic tables, noted
where they matter): no empty documents, no documents shorter than the
winnowing k-gram width.
"""
from __future__ import annotations

from ..functions.hashing import (
    MERSENNE_P,
    MINHASH_K,
    MINHASH_ROWS,
    SHINGLE_W,
    WINNOW_K,
    WINNOW_W,
    minhash_coeffs,
)
from ..functions.textstats import LANGS, STOPWORDS
from ..stages.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_THRESHOLD,
    SIMHASH_BAND_BITS,
    SIMHASH_MAX_HAMMING,
    SIMHASH_NUM_BANDS,
)
from ..stages import simsearch as ss
from ..stages.simsearch import COS_DUP_THRESHOLD, KNN_K, N_QUERIES

EMB_DIM = 64  # driver testdata embedding width (TESTDATA.md)
from .dataops import (
    EMB_COPY_EVERY,
    EMB_COPY_OFFSET,
    EXACT_COPY_EVERY,
    EXACT_COPY_OFFSET,
    MEDIA_EVERY,
    NEAR_DUP_EVERY,
    NEAR_DUP_OFFSET,
)

_H60 = "('0x' || substr(md5({}), 1, 15))::BIGINT"

# The augmented documents view (dataops._augment_docs's SQL twin).
_AUG = f"""
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {EXACT_COPY_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % {EXACT_COPY_EVERY} = 0
  UNION ALL
  SELECT doc_id + {NEAR_DUP_OFFSET} AS doc_id,
         array_to_string(l[1:len(l) - 1], ' ') AS text
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM documents)
  WHERE doc_id % {NEAR_DUP_EVERY} = 0
)"""

def shingle_hash_ctes(table: str, key: str = "doc_id",
                      names: tuple = ("tk", "sh2", "shh2"),
                      nonempty: bool = False) -> str:
    """Distinct word-SHINGLE_W-gram hash60 CTE chain over ``table``,
    keyed by ``key`` — ONE definition of the shingle rule (short docs ->
    one whole-text shingle) shared by the decontaminate, curate_corpus
    and source_overlap oracles so it cannot drift from
    functions/hashing.shingles.  ``nonempty`` filters empty/whitespace
    docs (Python ``shingles('') == []``; SQL would otherwise yield the
    '' shingle) for consumers whose key universe must exclude them."""
    t, s, h = names
    where = "WHERE trim(text) <> ''" if nonempty else ""
    return f"""{t} AS (
  SELECT {key}, l, len(l) AS nt
  FROM (SELECT {key}, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM {table} {where})
),
{s} AS (
  SELECT DISTINCT {key},
         CASE WHEN nt < {SHINGLE_W} THEN array_to_string(l, ' ')
              ELSE l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] END AS s
  FROM {t},
       UNNEST(generate_series(1, greatest(nt - {SHINGLE_W - 1}, 1))) AS u(i)
),
{h} AS (SELECT DISTINCT {key}, {_H60.format('s')} AS h FROM {s})"""


# Distinct word-SHINGLE_W-grams of the augmented view, with reduced hash.
_SHINGLES = f"""
toks AS (
  SELECT doc_id, l, len(l) AS nt
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM aug)
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN nt < {SHINGLE_W} THEN array_to_string(l, ' ')
              ELSE l[i] || ' ' || l[i + 1] || ' ' || l[i + 2] END AS s
  FROM toks,
       UNNEST(generate_series(1, greatest(nt - {SHINGLE_W - 1}, 1))) AS u(i)
),
shh AS (
  SELECT DISTINCT doc_id, {_H60.format('s')} % {MERSENNE_P} AS hp FROM sh
)"""


def _seeds_values() -> str:
    a, b = minhash_coeffs()
    rows = ", ".join(f"({i}, {a[i]}, {b[i]})" for i in range(MINHASH_K))
    return f"seeds(i, a, b) AS (SELECT * FROM (VALUES {rows}))"


def dataops_oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["dedup_exact"] = f"""WITH {_AUG.strip()}
SELECT min(doc_id) AS doc_id FROM aug GROUP BY md5(text)"""

    # dedup_incremental: incoming batch (the augmented view's synthetic
    # additions) anti-joined against the base corpus on hash60(text) —
    # the Bloom prefilter is an execution device only, the result is the
    # plain exact anti-join.
    # dedup_fingerprint_pairs: winnowing selection mirrored from the
    # doc_fingerprint oracle, over the AUG view; fingerprints with df
    # outside [2, MAX_DF] drop (the df cut), pairs keep when the shared
    # count clears FP_MIN_SHARED.
    from ..functions.hashing import WINNOW_K, WINNOW_W
    from ..stages.dedup import (
        FP_MAX_DF,
        FP_MIN_SHARED,
        FP_OVERLAP_DEN,
        FP_OVERLAP_NUM,
    )

    _fp_body = f"""{_AUG.strip()},
t AS (SELECT doc_id, text, length(text) AS n FROM aug),
g AS (
  SELECT doc_id, i, {_H60.format(f'substr(text, i, {WINNOW_K})')} AS h
  FROM t, UNNEST(generate_series(1, n - {WINNOW_K} + 1)) AS u(i)
  WHERE n >= {WINNOW_K}
),
m AS (
  SELECT doc_id, h,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
           AS wmin
  FROM g
),
sel AS (SELECT DISTINCT doc_id, h FROM m WHERE h = wmin),
df AS (SELECT h FROM sel GROUP BY h
       HAVING count(*) BETWEEN 2 AND {FP_MAX_DF}),
kept AS (SELECT sel.doc_id, sel.h FROM sel JOIN df USING (h)),
nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
       FROM kept GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM kept a
  JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
fpairs AS (
  SELECT doc_id_a, doc_id_b, n_shared, least(na.n_fp, nb.n_fp) AS mn
  FROM p
  JOIN nf na ON na.doc_id = p.doc_id_a
  JOIN nf nb ON nb.doc_id = p.doc_id_b
  WHERE n_shared >= {FP_MIN_SHARED}
    AND {FP_OVERLAP_DEN} * n_shared >= {FP_OVERLAP_NUM}
        * least(na.n_fp, nb.n_fp)
)"""
    sqls["dedup_fingerprint_pairs"] = f"""WITH {_fp_body}
SELECT doc_id_a, doc_id_b, n_shared,
       (n_shared * 2000000 + mn) // (2 * mn) / 1000000.0 AS overlap
FROM fpairs"""

    sqls["dedup_fingerprint_survivors"] = f"""WITH RECURSIVE {_fp_body},
edges AS (SELECT doc_id_a AS a, doc_id_b AS b FROM fpairs
          UNION SELECT doc_id_b AS a, doc_id_a AS b FROM fpairs),
reach AS (
  SELECT a AS node, b AS other FROM edges
  UNION
  SELECT r.node, e.b AS other FROM reach r JOIN edges e ON r.other = e.a
),
comp AS (
  SELECT node, least(node, min(other)) AS label FROM reach GROUP BY node
)
SELECT doc_id FROM aug
WHERE doc_id NOT IN (SELECT node FROM comp WHERE label <> node)"""

    sqls["dedup_incremental"] = f"""WITH {_AUG.strip()},
inc AS (
  SELECT doc_id, {_H60.format('text')} AS h
  FROM aug WHERE doc_id >= {NEAR_DUP_OFFSET}
),
rh AS (SELECT DISTINCT {_H60.format('text')} AS h FROM documents)
SELECT doc_id, h FROM inc
WHERE h NOT IN (SELECT h FROM rh)"""

    from .dataops import CASE_VAR_EVERY, CASE_VAR_OFFSET

    # dedup_exact_norm: its own view (exact copies + byte-unequal but
    # normalized-equal case/punct variants); normalization = lower ->
    # punctuation strip -> whitespace squeeze, same order as Python.
    sqls["dedup_exact_norm"] = rf"""WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {EXACT_COPY_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % {EXACT_COPY_EVERY} = 0
  UNION ALL
  SELECT doc_id + {CASE_VAR_OFFSET} AS doc_id, upper(text) || ' !!' AS text
  FROM documents WHERE doc_id % {CASE_VAR_EVERY} = 0
),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS ntext
  FROM aug
)
SELECT min(doc_id) AS doc_id FROM norm GROUP BY md5(ntext)"""

    # signature + banding CTEs, shared by the in-corpus pair oracle and
    # the benchmark decontamination oracle (one definition, zero drift)
    _mh_bands = f"""{_SHINGLES.strip()},
{_seeds_values()},
mh AS (
  SELECT doc_id, i, min((a * hp + b) % {MERSENNE_P}) AS mh
  FROM shh, seeds GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, i // {MINHASH_ROWS} AS band_id,
         substr(md5(CAST(i // {MINHASH_ROWS} AS VARCHAR) || ':' ||
                    string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i)), 1, 16)
           AS band_key
  FROM mh GROUP BY doc_id, i // {MINHASH_ROWS}
)"""
    _mh_tail = f"""{_mh_bands},
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
matches AS (
  SELECT c.da, c.db, sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS m
  FROM cand c
  JOIN mh x ON x.doc_id = c.da
  JOIN mh y ON y.doc_id = c.db AND y.i = x.i
  GROUP BY c.da, c.db
)"""
    _mh_body = f"{_AUG.strip()},\n{_mh_tail}"

    sqls["dedup_minhash_pairs"] = f"""WITH {_mh_body}
SELECT da AS doc_id_a, db AS doc_id_b,
       floor((m / {float(MINHASH_K)}) * 1000000 + 0.5) / 1000000 AS est_jaccard
FROM matches WHERE m / {float(MINHASH_K)} >= {MINHASH_THRESHOLD}"""

    # decontaminate_fuzzy: corpus x BENCHMARK banding over the same
    # signature CTEs (bench = every DECON_EVERY-th base doc), integer
    # threshold 2*m >= K <=> est >= 0.5, self-pairs excluded.
    from .curation import DECON_EVERY

    _fz_body = f"""{_AUG.strip()},
{_mh_bands},
bench AS (
  SELECT band_id, band_key, doc_id FROM bands
  WHERE doc_id % {DECON_EVERY} = 0 AND doc_id < {NEAR_DUP_OFFSET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d, b.doc_id AS bench_id
  FROM bands a JOIN bench b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id <> b.doc_id
),
matches AS (
  SELECT c.d, c.bench_id,
         sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS m
  FROM cand c
  JOIN mh x ON x.doc_id = c.d
  JOIN mh y ON y.doc_id = c.bench_id AND y.i = x.i
  GROUP BY c.d, c.bench_id
)"""
    sqls["decontaminate_fuzzy"] = f"""WITH {_fz_body}
SELECT d AS doc_id, bench_id,
       floor((m / {float(MINHASH_K)}) * 1000000 + 0.5) / 1000000
         AS est_jaccard
FROM matches WHERE 2 * m >= {MINHASH_K}"""

    sqls["decontaminate_fuzzy_survivors"] = f"""WITH {_fz_body}
SELECT doc_id FROM aug
WHERE doc_id NOT IN (SELECT d FROM matches WHERE 2 * m >= {MINHASH_K})"""

    # same candidate/verify pipeline, then connected components via a
    # recursive transitive closure (engine: stages/dedup.cc_bucket_labels)
    _mh_cc = f"""{_mh_body},
pairs AS (
  SELECT da AS a, db AS b FROM matches
  WHERE m / {float(MINHASH_K)} >= {MINHASH_THRESHOLD}
),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach AS (
  SELECT a AS node, b AS other FROM edges
  UNION
  SELECT r.node, e.b AS other FROM reach r JOIN edges e ON r.other = e.a
),
comp AS (
  SELECT node, least(node, min(other)) AS label FROM reach GROUP BY node
)"""

    # survivors: min-label canonical selection per component
    sqls["dedup_minhash_survivors"] = f"""WITH RECURSIVE {_mh_cc}
SELECT doc_id FROM aug
WHERE doc_id NOT IN (SELECT node FROM comp WHERE label <> node)"""

    # component-size histogram (dataops.dup_cluster_sizes); singletons
    # never enter comp, so sizes start at 2 in both engines
    sqls["dup_cluster_sizes"] = f"""WITH RECURSIVE {_mh_cc},
cs AS (SELECT label, count(*) AS size FROM comp GROUP BY label)
SELECT size, count(*) AS n_clusters FROM cs GROUP BY size ORDER BY size"""

    # incremental near-dup screen (dataops.dedup_incremental_minhash):
    # incoming = augmented additions + the token-reversed novel family
    # (all ids >= NEAR_DUP_OFFSET, the smallest planted offset),
    # reference = the base corpus; an incoming doc is a dup iff it
    # band-matches AND signature-verifies against a REFERENCE doc.  Base
    # ids are always < the offsets, so the generic cand/matches
    # (da < db) pairs cover exactly the ref x incoming combinations.
    from .dataops import INC_NOVEL_EVERY, INC_NOVEL_OFFSET

    _inc_aug = _AUG.strip()[:-1] + f"""  UNION ALL
  SELECT doc_id + {INC_NOVEL_OFFSET} AS doc_id,
         array_to_string(list_reverse(l), ' ') AS text
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM documents)
  WHERE doc_id % {INC_NOVEL_EVERY} = 0
)"""
    sqls["dedup_incremental_minhash"] = f"""WITH {_inc_aug},
{_mh_tail},
dup AS (
  SELECT DISTINCT db AS doc_id FROM matches
  WHERE da < {NEAR_DUP_OFFSET} AND db >= {NEAR_DUP_OFFSET}
    AND m / {float(MINHASH_K)} >= {MINHASH_THRESHOLD}
)
SELECT doc_id FROM aug
WHERE doc_id >= {NEAR_DUP_OFFSET}
  AND doc_id NOT IN (SELECT doc_id FROM dup)"""

    # feature-hashing vectorizer (dataops.hash_embed): signed token
    # counts per hashed dimension, long-format nonzero rows
    from .dataops import HASH_EMBED_DIM

    sqls["hash_embed"] = f"""
WITH w AS (
  SELECT doc_id, u.tok FROM (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
    FROM documents
  ) t, UNNEST(l) AS u(tok)
),
h AS (SELECT doc_id, {_H60.format('tok')} AS hv FROM w),
e AS (
  SELECT doc_id, hv % {HASH_EMBED_DIM} AS dim,
         1 - 2 * ((hv >> 30) & 1) AS s
  FROM h
)
SELECT doc_id, dim, CAST(sum(s) AS BIGINT) AS weight
FROM e GROUP BY doc_id, dim HAVING sum(s) <> 0"""

    # integer top-K over the hash_embed space: sparse dim-join dot
    # product, positive scores only (dataops.hash_embed_knn's invariant)
    from .dataops import HE_K, HE_NQ

    sqls["hash_embed_knn"] = f"""
WITH w AS (
  SELECT doc_id, u.tok FROM (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
    FROM documents
  ) t, UNNEST(l) AS u(tok)
),
h AS (SELECT doc_id, {_H60.format('tok')} AS hv FROM w),
e AS (
  SELECT doc_id, hv % {HASH_EMBED_DIM} AS dim,
         1 - 2 * ((hv >> 30) & 1) AS s
  FROM h
),
v AS (
  SELECT doc_id, dim, CAST(sum(s) AS BIGINT) AS weight
  FROM e GROUP BY doc_id, dim HAVING sum(s) <> 0
),
q AS (SELECT doc_id AS query_id, dim, weight FROM v WHERE doc_id < {HE_NQ}),
scores AS (
  SELECT q.query_id, v.doc_id,
         CAST(sum(q.weight * v.weight) AS BIGINT) AS score
  FROM q JOIN v ON v.dim = q.dim
  WHERE v.doc_id <> q.query_id
  GROUP BY q.query_id, v.doc_id
  HAVING sum(q.weight * v.weight) > 0
),
r AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, score FROM r WHERE rank <= {HE_K}"""

    _sim = f"""
words AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, u.tok
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
              FROM aug) t, UNNEST(l) AS u(tok))
  GROUP BY doc_id, tok
),
bits AS (
  SELECT doc_id, p, sum(c * (2 * ((h >> p) & 1) - 1)) AS s
  FROM (SELECT doc_id, c, {_H60.format('tok')} AS h FROM words),
       UNNEST(generate_series(0, 59)) AS g(p)
  GROUP BY doc_id, p
),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << p) ELSE 0 END) AS v
  FROM bits GROUP BY doc_id
)"""

    sqls["dedup_simhash"] = f"""WITH {_AUG.strip()},
{_sim.strip()}
SELECT doc_id, printf('%015x', v::BIGINT) AS simhash FROM sim"""

    sqls["dedup_simhash_pairs"] = f"""WITH {_AUG.strip()},
{_sim.strip()},
simbands AS (
  SELECT doc_id, v, j,
         (v >> ({SIMHASH_BAND_BITS} * j)) & {(1 << SIMHASH_BAND_BITS) - 1} AS bv
  FROM sim, UNNEST(generate_series(0, {SIMHASH_NUM_BANDS - 1})) AS g(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, a.v AS va, b.doc_id AS db, b.v AS vb
  FROM simbands a JOIN simbands b
    ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT da AS doc_id_a, db AS doc_id_b,
       CAST(bit_count(xor(va, vb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(va, vb)) <= {SIMHASH_MAX_HAMMING}"""

    sqls["dedup_ngram_jaccard"] = f"""WITH {_AUG.strip()},
{_SHINGLES.strip()},
ns AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
  FROM shh a JOIN shh b ON a.hp = b.hp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT da AS doc_id_a, db AS doc_id_b,
       floor((CAST(i AS DOUBLE) / (x.n + y.n - i)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter JOIN ns x ON x.doc_id = da JOIN ns y ON y.doc_id = db
WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= {JACCARD_THRESHOLD}"""

    # prefix-filtered variant: lossless at the threshold -> same oracle
    sqls["dedup_jaccard_prefix"] = sqls["dedup_ngram_jaccard"]

    _knn_ctes = f"""q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
pairs AS (
  SELECT q.query_id, e.vec_id,
         floor(list_cosine_similarity(q.embedding::DOUBLE[],
                                     e.embedding::DOUBLE[]) * 1000000 + 0.5)
           / 1000000 AS c
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, vec_id) AS rank
  FROM pairs
)"""
    _knn = (
        "WITH " + _knn_ctes
        + f"\nSELECT query_id, vec_id, rank FROM r WHERE rank <= {KNN_K}"
    )
    sqls["knn_cosine"] = _knn
    sqls["knn_ivf"] = _knn  # nprobe = all lists -> exact
    sqls["knn_ivf_trained"] = _knn  # trained quantizer, nprobe=all -> exact

    # pq_encode: the fixed-iteration per-subspace integer Lloyd unrolled
    # into CTE rounds (the kmeans_iterate discipline) — pure int64 shifted
    # micro-units end to end, so sum()/floor-division/argmin tie-breaks
    # are engine-independent.  ``ms`` (subspace id) is carried through
    # every CTE so all PQ_M codebooks train in one relational pass.
    from .dataops import PQ_ITERS, PQ_K, PQ_M, PQ_OFF

    pq_parts = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "dims AS (SELECT len(v) AS dim FROM e LIMIT 1)",
        "q0 AS (SELECT vec_id, generate_subscripts(v, 1) AS d, "
        f"CAST(floor(unnest(v) * 1000000 + 0.5) AS BIGINT) + {PQ_OFF} "
        "AS xq FROM e)",
        f"qm AS (SELECT q0.vec_id, q0.d, q0.xq, "
        f"CAST(((q0.d - 1) * {PQ_M}) // dims.dim AS BIGINT) AS ms "
        "FROM q0, dims)",
        "b0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
        "AS BIGINT) AS cid, vec_id FROM "
        f"(SELECT vec_id FROM e ORDER BY vec_id LIMIT {PQ_K}))",
        "c0 AS (SELECT qm.ms, b.cid, qm.d, qm.xq AS cq "
        "FROM b0 b JOIN qm ON qm.vec_id = b.vec_id)",
    ]
    for r in range(PQ_ITERS):
        pq_parts += [
            f"dd{r} AS (SELECT q.ms, q.vec_id, c.cid, "
            "sum((q.xq - c.cq) * (q.xq - c.cq)) AS dist "
            f"FROM qm q JOIN c{r} c ON c.ms = q.ms AND c.d = q.d "
            "GROUP BY q.ms, q.vec_id, c.cid)",
            f"a{r} AS (SELECT ms, vec_id, cid, row_number() OVER ("
            "PARTITION BY ms, vec_id ORDER BY dist, cid) AS rn "
            f"FROM dd{r})",
            f"f{r} AS (SELECT ms, vec_id, cid FROM a{r} WHERE rn = 1)",
            f"s{r} AS (SELECT f.ms, f.cid, q.d, sum(q.xq) AS sq, "
            f"count(*) AS n FROM f{r} f JOIN qm q "
            "ON q.vec_id = f.vec_id AND q.ms = f.ms "
            "GROUP BY f.ms, f.cid, q.d)",
            f"c{r + 1} AS (SELECT c.ms, c.cid, c.d, "
            "CAST(COALESCE(s.sq // s.n, c.cq) AS BIGINT) AS cq "
            f"FROM c{r} c LEFT JOIN s{r} s "
            "ON s.ms = c.ms AND s.cid = c.cid AND s.d = c.d)",
        ]
    pq_codes = ", ".join(
        f"CAST(max(CASE WHEN ms = {m} THEN cid END) AS BIGINT) AS code_{m}"
        for m in range(PQ_M)
    )
    pq_final = f""",
ddF AS (SELECT q.ms, q.vec_id, c.cid,
        sum((q.xq - c.cq) * (q.xq - c.cq)) AS dist
        FROM qm q JOIN c{PQ_ITERS} c ON c.ms = q.ms AND c.d = q.d
        GROUP BY q.ms, q.vec_id, c.cid),
aF AS (SELECT ms, vec_id, cid, row_number() OVER (PARTITION BY ms, vec_id
       ORDER BY dist, cid) AS rn FROM ddF)"""
    sqls["pq_encode"] = (
        "WITH " + ",\n".join(pq_parts) + pq_final + f"""
SELECT vec_id, {pq_codes}
FROM aF WHERE rn = 1 GROUP BY vec_id"""
    )

    # pq_search: asymmetric distance — query subvector dims against the
    # codeword each vector's final code selects, summed over all dims;
    # rank by (adc, vec_id) with self-match excluded (the knn discipline).
    sqls["pq_search"] = (
        "WITH " + ",\n".join(pq_parts) + pq_final + f""",
codes AS (SELECT ms, vec_id, cid FROM aF WHERE rn = 1),
adc AS (
  SELECT qv.vec_id AS query_id, cd.vec_id,
         CAST(sum((qv.xq - bb.cq) * (qv.xq - bb.cq)) AS BIGINT) AS adc
  FROM codes cd
  JOIN c{PQ_ITERS} bb ON bb.ms = cd.ms AND bb.cid = cd.cid
  JOIN (SELECT * FROM qm WHERE vec_id < {N_QUERIES}) qv
    ON qv.ms = cd.ms AND qv.d = bb.d
  WHERE cd.vec_id <> qv.vec_id
  GROUP BY qv.vec_id, cd.vec_id
),
rk AS (SELECT query_id, vec_id, adc, row_number() OVER (
       PARTITION BY query_id ORDER BY adc, vec_id) AS rank FROM adc)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank, adc
FROM rk WHERE rank <= {KNN_K}"""
    )

    # ann_recall: recall@k of the PQ scan against the exact brute force —
    # the exact knn CTEs (q/pairs/r) and the PQ CTEs share one WITH block
    # (no name collisions by construction); intersection counted per
    # query, 0-overlap queries kept via the LEFT JOIN.
    sqls["ann_recall"] = (
        "WITH " + _knn_ctes + ",\n" + ",\n".join(pq_parts) + pq_final
        + f""",
codes AS (SELECT ms, vec_id, cid FROM aF WHERE rn = 1),
adc AS (
  SELECT qv.vec_id AS query_id, cd.vec_id,
         CAST(sum((qv.xq - bb.cq) * (qv.xq - bb.cq)) AS BIGINT) AS adc
  FROM codes cd
  JOIN c{PQ_ITERS} bb ON bb.ms = cd.ms AND bb.cid = cd.cid
  JOIN (SELECT * FROM qm WHERE vec_id < {N_QUERIES}) qv
    ON qv.ms = cd.ms AND qv.d = bb.d
  WHERE cd.vec_id <> qv.vec_id
  GROUP BY qv.vec_id, cd.vec_id
),
prk AS (SELECT query_id, vec_id, row_number() OVER (
        PARTITION BY query_id ORDER BY adc, vec_id) AS rank FROM adc),
ov AS (
  SELECT x.query_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM (SELECT query_id, vec_id FROM r WHERE rank <= {KNN_K}) x
  JOIN (SELECT query_id, vec_id FROM prk WHERE rank <= {KNN_K}) p
    USING (query_id, vec_id)
  GROUP BY x.query_id
),
qs AS (SELECT DISTINCT query_id FROM q)
SELECT qs.query_id,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(100 * COALESCE(ov.n_overlap, 0) // {KNN_K} AS BIGINT)
         AS recall_pct
FROM qs LEFT JOIN ov USING (query_id)"""
    )

    # Mirrors stages/simsearch.py:cosine_dup_pairs_lsh BIT FOR BIT:
    # integer-quantized embeddings x md5-derived integer hyperplanes ->
    # 8x8-bit sign bands; candidates share a band, survivors pass the
    # round6-cosine threshold.  Because the banding itself is mirrored,
    # the hash check is robust for any embedding content (the previous
    # exact-all-pairs oracle only matched while every near-dup was an
    # exact copy with deterministic LSH recall 1.0).
    _hp_w = _H60.format("'rhp:' || d.d || ':' || bi.b")
    _rhp_body = f"""emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_COPY_OFFSET}, embedding::DOUBLE[] FROM embeddings
  WHERE vec_id % {EMB_COPY_EVERY} = 0
),
dims AS (SELECT i::BIGINT AS d FROM range({EMB_DIM}) t(i)),
bitsi AS (SELECT i::BIGINT AS b FROM range({ss.RHP_BITS}) t(i)),
hp AS (
  SELECT d.d, bi.b, ({_hp_w} % {ss.RHP_W_MOD}) - {ss.RHP_W_MOD // 2} AS w
  FROM dims d, bitsi bi
),
qv AS (
  SELECT vec_id, d.d,
         CAST(floor(e[d.d + 1] * {ss.RHP_Q} + 0.5) AS BIGINT) AS qx
  FROM emb, dims d
),
bits AS (
  SELECT qv.vec_id, hp.b,
         CASE WHEN sum(qv.qx * hp.w) >= 0 THEN 1 ELSE 0 END AS bit
  FROM qv JOIN hp ON qv.d = hp.d
  GROUP BY qv.vec_id, hp.b
),
bands AS (
  SELECT vec_id, b // {ss.RHP_BAND_BITS} AS band_id,
         sum(bit * (1 << (b % {ss.RHP_BAND_BITS}))) AS band_val
  FROM bits GROUP BY vec_id, b // {ss.RHP_BAND_BITS}
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_val = y.band_val
   AND x.vec_id < y.vec_id
),
vpairs AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN emb ea ON ea.vec_id = c.a
  JOIN emb eb ON eb.vec_id = c.b
  WHERE floor(list_cosine_similarity(ea.e, eb.e) * 1000000 + 0.5)
        / 1000000 >= {COS_DUP_THRESHOLD}
)"""
    sqls["embedding_dup_pairs"] = (
        "WITH " + _rhp_body
        + "\nSELECT a AS vec_id_a, b AS vec_id_b FROM vpairs"
    )
    # survivors: same banding+verify pairs, then the recursive transitive
    # closure / min-label canonical selection (dedup_minhash_survivors
    # twin, over vec ids)
    sqls["embedding_dup_survivors"] = (
        "WITH RECURSIVE " + _rhp_body + """,
edges AS (SELECT a, b FROM vpairs UNION SELECT b AS a, a AS b FROM vpairs),
reach AS (
  SELECT a AS node, b AS other FROM edges
  UNION
  SELECT r.node, e.b AS other FROM reach r JOIN edges e ON r.other = e.a
),
comp AS (
  SELECT node, least(node, min(other)) AS label FROM reach GROUP BY node
)
SELECT vec_id FROM emb
WHERE vec_id NOT IN (SELECT node FROM comp WHERE label <> node)"""
    )

    # semdedup: kmeans_assign's centroid rule (k lowest-vec_id base
    # embeddings, max rounded cosine, ties to lowest cid) + within-cluster
    # prune against the SEMDEDUP_REF_CAP lowest-vec_id members (rk <= CAP
    # mirrors dataops.semdedup's capped reference set bit for bit)
    from .dataops import SEMDEDUP_EPS, SEMDEDUP_REF_CAP
    from .analytics import KMEANS_K

    sqls["semdedup"] = f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_COPY_OFFSET}, embedding::DOUBLE[] FROM embeddings
  WHERE vec_id % {EMB_COPY_EVERY} = 0
),
cent AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS e FROM embeddings
  ORDER BY vec_id LIMIT {KMEANS_K}
),
pc AS (
  SELECT emb.vec_id, c.cid,
         floor(list_cosine_similarity(emb.e, c.e) * 1000000 + 0.5)
           / 1000000 AS cos
  FROM emb, cent c
),
asg AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cid) AS rn
    FROM pc) WHERE rn = 1
),
m AS (
  SELECT a.vec_id, a.cluster, e.e,
         row_number() OVER (PARTITION BY a.cluster ORDER BY a.vec_id) AS rk
  FROM asg a JOIN emb e ON e.vec_id = a.vec_id
),
dup AS (
  SELECT DISTINCT v.vec_id
  FROM m v JOIN m u
    ON u.cluster = v.cluster AND u.vec_id < v.vec_id
   AND u.rk <= {SEMDEDUP_REF_CAP}
  WHERE floor(list_cosine_similarity(u.e, v.e) * 1000000 + 0.5)
        / 1000000 >= {SEMDEDUP_EPS}
)
SELECT m.vec_id, m.cluster,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m LEFT JOIN dup d ON d.vec_id = m.vec_id"""

    sqls["token_count"] = r"""SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_ws,
       len(regexp_extract_all(text, '\w+')) AS n_words,
       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe
FROM documents"""

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    sqls["text_quality"] = f"""WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\\s+') AS l
  FROM documents
),
c AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(l) AS n_ws,
         len(list_filter(l, x -> list_contains([{stop_list}], lower(x))))
           AS n_stop,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         length(array_to_string(l, '')) AS tok_chars
  FROM t
)
SELECT doc_id, n_chars, n_ws,
       floor((CAST(n_stop AS DOUBLE) / n_ws) * 1000000 + 0.5) / 1000000 AS stop_ratio,
       floor((CAST(n_punct AS DOUBLE) / n_chars) * 1000000 + 0.5) / 1000000 AS punct_ratio,
       floor((CAST(tok_chars AS DOUBLE) / n_ws) * 1000000 + 0.5) / 1000000 AS mean_word_len,
       floor((0.5 * least(1.0, n_ws / 50.0)
             + 0.3 * least(1.0, (CAST(n_stop AS DOUBLE) / n_ws) * 5.0)
             + 0.2 * (1.0 - least(1.0, (CAST(n_punct AS DOUBLE) / n_chars)
                                       * 10.0))) * 1000000 + 0.5) / 1000000
         AS quality
FROM c"""

    lang_list = ", ".join(f"'{l}'" for l in LANGS)
    lang_idx = f"({_H60.format(chr(39) + 'langlex:' + chr(39) + ' || tok')} % {len(LANGS)}) + 1"
    sqls["lang_id"] = f"""WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
  FROM documents
),
w AS (SELECT doc_id, u.tok FROM t, UNNEST(l) AS u(tok)),
v AS (
  SELECT doc_id, ([{lang_list}])[{lang_idx}] AS lang, count(*) AS c
  FROM w GROUP BY doc_id, lang
),
n AS (SELECT doc_id, sum(c) AS total FROM v GROUP BY doc_id),
r AS (
  SELECT v.doc_id, v.lang, v.c, n.total,
         row_number() OVER (PARTITION BY v.doc_id
                            ORDER BY v.c DESC, v.lang) AS rn
  FROM v JOIN n ON v.doc_id = n.doc_id
)
SELECT doc_id, lang AS lang_pred,
       floor((CAST(c AS DOUBLE) / total) * 1000000 + 0.5) / 1000000 AS vote_ratio
FROM r WHERE rn = 1"""

    sqls["doc_fingerprint"] = f"""WITH t AS (
  SELECT doc_id, text, length(text) AS n FROM documents
),
g AS (
  SELECT doc_id, i,
         {_H60.format(f'substr(text, i, {WINNOW_K})')} AS h
  FROM t, UNNEST(generate_series(1, n - {WINNOW_K} + 1)) AS u(i)
  WHERE n >= {WINNOW_K}
),
m AS (
  SELECT doc_id, h,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW)
           AS wmin
  FROM g
),
sel AS (SELECT DISTINCT doc_id, h FROM m WHERE h = wmin)
SELECT doc_id, count(*) AS n_fp,
       substr(md5(string_agg(CAST(h AS VARCHAR), '-' ORDER BY h)), 1, 16)
         AS fp_digest
FROM sel GROUP BY doc_id"""

    from ..functions.binmedia import (
        BMP_H,
        BMP_PIX_STEP,
        BMP_W,
        WAV_MOD,
        WAV_N_SAMPLES,
        WAV_RATE,
        WAV_STEP,
    )

    bmp_n = BMP_W * BMP_H * 3
    bmp_bytes = 14 + 40 + bmp_n
    wav_bytes = 44 + 2 * WAV_N_SAMPLES
    half = (WAV_MOD - 1) // 2
    seed_b = _H60.format(
        "'bmp:' || CAST(doc_id AS VARCHAR)") + " % 256"
    seed_w = _H60.format(
        "'wav:' || CAST(doc_id AS VARCHAR)") + f" % {WAV_MOD}"
    # closed-form twin of the decoders: the payload generators are
    # (seed + a*k) % m sequences, so the decoded aggregates are plain
    # generate_series sums — the oracle checks the parser extracted
    # exactly what was encoded
    sqls["media_decode"] = f"""WITH dm AS (
  SELECT doc_id, {seed_b} AS sb, {seed_w} AS sw
  FROM documents WHERE doc_id % {MEDIA_EVERY} = 0
)
SELECT 2 * doc_id AS media_id, 'bmp' AS fmt,
       CAST({bmp_bytes} AS BIGINT) AS n_bytes,
       CAST({BMP_W} AS BIGINT) AS width, CAST({BMP_H} AS BIGINT) AS height,
       CAST(0 AS BIGINT) AS n_samples, CAST(0 AS BIGINT) AS sample_rate,
       (SELECT CAST(sum((dm.sb + {BMP_PIX_STEP} * g.k) % 256) AS BIGINT)
        FROM generate_series(0, {bmp_n - 1}) g(k)) AS sample_sum
FROM dm
UNION ALL
SELECT 2 * doc_id + 1, 'wav', CAST({wav_bytes} AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST({WAV_N_SAMPLES} AS BIGINT), CAST({WAV_RATE} AS BIGINT),
       (SELECT CAST(sum(abs(((dm.sw + {WAV_STEP} * g.k) % {WAV_MOD})
                            - {half})) AS BIGINT)
        FROM generate_series(0, {WAV_N_SAMPLES - 1}) g(k))
FROM dm"""

    # media_decode_png: the raw (post-unfilter) byte stream is the
    # (seed + 29k) % 256 lattice, so both aggregates are generate_series
    # sums; wsum = sum (k+1)*byte[k] is position-sensitive — a wrong
    # unfilter or row order shifts it even when the plain sum cancels.
    from ..functions.binmedia import PNG_H, PNG_PIX_STEP, PNG_W

    png_n = PNG_W * PNG_H * 3
    seed_p = _H60.format(
        "'png:' || CAST(doc_id AS VARCHAR)") + " % 256"
    sqls["media_decode_png"] = f"""WITH dm AS (
  SELECT doc_id, {seed_p} AS sp
  FROM documents WHERE doc_id % {MEDIA_EVERY} = 0
)
SELECT doc_id AS media_id,
       CAST({PNG_W} AS BIGINT) AS width, CAST({PNG_H} AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS channels, CAST(8 AS BIGINT) AS bit_depth,
       (SELECT CAST(sum((dm.sp + {PNG_PIX_STEP} * g.k) % 256) AS BIGINT)
        FROM generate_series(0, {png_n - 1}) g(k)) AS byte_sum,
       (SELECT CAST(sum((g.k + 1) * ((dm.sp + {PNG_PIX_STEP} * g.k) % 256))
                    AS BIGINT)
        FROM generate_series(0, {png_n - 1}) g(k)) AS wsum
FROM dm"""

    # media_decode_jpeg: DC-only 8x8 blocks round-trip exactly (block b
    # decodes to its constant (seed + 31b) % 256), so byte_sum is a
    # 32-term lattice sum and wsum uses the closed-form per-block
    # position weight S_b = 32768*(b//8) + 512*(b%8) + 14624
    # (= sum of (k+1) over block b's 64 row-major pixel indices in the
    # 64x32 grid; the constants pin width=64, 8-block rows).
    from ..functions.binmedia import JPEG_BLOCK_STEP, JPEG_H, JPEG_W

    jpeg_nb = (JPEG_W // 8) * (JPEG_H // 8)
    seed_j = _H60.format(
        "'jpeg:' || CAST(doc_id AS VARCHAR)") + " % 256"
    sqls["media_decode_jpeg"] = f"""WITH dm AS (
  SELECT doc_id, {seed_j} AS sj
  FROM documents WHERE doc_id % {MEDIA_EVERY} = 0
)
SELECT doc_id AS media_id,
       CAST({JPEG_W} AS BIGINT) AS width, CAST({JPEG_H} AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_components,
       (SELECT CAST(sum(64 * ((dm.sj + {JPEG_BLOCK_STEP} * g.b) % 256))
                    AS BIGINT)
        FROM generate_series(0, {jpeg_nb - 1}) g(b)) AS byte_sum,
       (SELECT CAST(sum(((dm.sj + {JPEG_BLOCK_STEP} * g.b) % 256)
                        * (32768 * (g.b // 8) + 512 * (g.b % 8) + 14624))
                    AS BIGINT)
        FROM generate_series(0, {jpeg_nb - 1}) g(b)) AS wsum
FROM dm"""

    # media_resize: NN 2x downscale keeps file rows 0,2,.. and pixel
    # columns 0,2,..; pixel byte k of the source is (seed + 17k) % 256,
    # so the kept bytes are the arithmetic lattice
    #   k(j) = (2*(j // orow))*irow + 3*(2*((j % orow) // 3)) + j % 3
    # over j in [0, out_h*orow) — a closed-form generate_series sum.
    _ow, _oh = (BMP_W + 1) // 2, (BMP_H + 1) // 2
    _orow, _irow = _ow * 3, BMP_W * 3
    _opad = (4 - _orow % 4) % 4
    _onb = 54 + (_orow + _opad) * _oh
    _kj = (f"(2 * (j // {_orow})) * {_irow}"
           f" + 6 * ((j % {_orow}) // 3) + j % 3")
    sqls["media_resize"] = f"""WITH dm AS (
  SELECT doc_id, {seed_b} AS sb
  FROM documents WHERE doc_id % {MEDIA_EVERY} = 0
)
SELECT 2 * doc_id AS media_id,
       CAST({_onb} AS BIGINT) AS n_bytes,
       CAST({_ow} AS BIGINT) AS width, CAST({_oh} AS BIGINT) AS height,
       (SELECT CAST(sum((dm.sb + {BMP_PIX_STEP} * ({_kj})) % 256) AS BIGINT)
        FROM generate_series(0, {_oh * _orow - 1}) g(j)) AS byte_sum
FROM dm"""

    # media_frames: sample i of the WAV is ((seed + 37*i) % 2001) - 1000,
    # so each kept frame's |sum| is a closed-form generate_series sum;
    # kept frame ids and lengths are compile-time constants.
    from ..functions.binmedia import FRAME_LEN, FRAME_STEP

    _nf = -(-WAV_N_SAMPLES // FRAME_LEN)
    _kept = list(range(0, _nf, FRAME_STEP))
    _fl = {fi: min(FRAME_LEN, WAV_N_SAMPLES - fi * FRAME_LEN)
           for fi in _kept}
    _frame_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, sw, CAST({fi} AS BIGINT) AS fi,"
        f" CAST({_fl[fi]} AS BIGINT) AS flen FROM dm"
        for fi in _kept
    )
    sqls["media_frames"] = f"""WITH dm AS (
  SELECT doc_id, {seed_w} AS sw
  FROM documents WHERE doc_id % {MEDIA_EVERY} = 0
),
fr AS ({_frame_rows})
SELECT 2 * doc_id + 1 AS media_id, fi AS frame_id, flen AS n_samples,
       (SELECT CAST(sum(CASE WHEN i < flen THEN
                   abs(((fr.sw + {WAV_STEP} * (fi * {FRAME_LEN} + i))
                        % {WAV_MOD}) - {half}) ELSE 0 END) AS BIGINT)
        FROM generate_series(0, {FRAME_LEN - 1}) s(i)) AS abs_sum
FROM fr"""

    sqls["unigram_logprob"] = r"""WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
  FROM documents
),
w AS (SELECT doc_id, u.tok FROM t, UNNEST(l) AS u(tok)),
c AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY tok),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
d AS (
  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS ntok,
         CAST(sum(length(bin(c.c)) - 1) AS BIGINT) AS slp
  FROM w JOIN c USING (tok) GROUP BY w.doc_id
)
SELECT d.doc_id, d.ntok AS n_tokens, d.slp AS sum_log2,
       CAST(d.slp * 1000000 // (d.ntok * (length(bin(n.n)) - 1)) AS DOUBLE)
         / 1000000 AS lm_score
FROM d, n"""

    # bigram_logprob: the unigram twin one order up — whitespace-token
    # bigrams, integer-log2 via bin() bit length; docs with < 2 tokens
    # stay in the output via the LEFT JOIN with 0/0/0.0.
    sqls["bigram_logprob"] = r"""WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
  FROM documents
),
g AS (
  SELECT doc_id, l[u.i] || ' ' || l[u.i + 1] AS gram
  FROM t, UNNEST(generate_series(1, len(l) - 1)) AS u(i)
  WHERE len(l) >= 2
),
c AS (SELECT gram, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY gram),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
d AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(length(bin(c.c)) - 1) AS BIGINT) AS slp
  FROM g JOIN c USING (gram) GROUP BY g.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(d.ng, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(d.slp, 0) AS BIGINT) AS sum_log2,
       CASE WHEN d.ng IS NULL OR d.ng = 0 OR n.n <= 1 THEN 0.0
            ELSE CAST(d.slp * 1000000
                      // (d.ng * (length(bin(n.n)) - 1)) AS DOUBLE)
                 / 1000000 END AS lm2_score
FROM t LEFT JOIN d USING (doc_id), n"""

    from .dataops import DSIR_TARGET_EVERY

    # importance_weights: integer-quantized DSIR log-likelihood ratio;
    # target slice = every DSIR_TARGET_EVERY-th doc, target counts scaled
    # by the slice ratio R so corpus-typical tokens weigh ~0 (bin() bit
    # length mirrors Python bit_length(); +1 smooths both sides).
    _iw_ctes = rf"""t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
  FROM documents
),
w AS (SELECT doc_id, u.tok FROM t, UNNEST(l) AS u(tok)),
c AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c_raw,
         CAST(count(*) FILTER (WHERE doc_id % {DSIR_TARGET_EVERY} = 0)
              AS BIGINT) AS c_tgt
  FROM w GROUP BY tok
)"""
    _iw_sel = f"""SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(length(bin({DSIR_TARGET_EVERY} * c.c_tgt + 1))
                - length(bin(c.c_raw + 1))) AS BIGINT) AS sum_ratio
FROM w JOIN c USING (tok) GROUP BY w.doc_id"""
    sqls["importance_weights"] = f"WITH {_iw_ctes}\n{_iw_sel}"

    # importance_resample: systematic lattice resampling over the same
    # score — n_copies counts lattice points (k+1/2)·W/N inside each
    # doc's cumulative-weight interval, in pure (HUGEINT) integer
    # arithmetic, mirroring the engine's n_below().
    _f_lo = ("CASE WHEN 2 * CAST(s.hi - s.w AS HUGEINT) * tot.n - tot.tw"
             " <= 0 THEN 0 ELSE (2 * CAST(s.hi - s.w AS HUGEINT) * tot.n"
             " - tot.tw - 1) // (2 * tot.tw) + 1 END")
    _f_hi = ("CASE WHEN 2 * CAST(s.hi AS HUGEINT) * tot.n - tot.tw <= 0"
             " THEN 0 ELSE (2 * CAST(s.hi AS HUGEINT) * tot.n - tot.tw"
             " - 1) // (2 * tot.tw) + 1 END")
    sqls["importance_resample"] = f"""WITH {_iw_ctes},
iw AS ({_iw_sel}),
wt AS (SELECT doc_id, greatest(sum_ratio, 0) + 1 AS w FROM iw),
tot AS (SELECT CAST(sum(w) AS HUGEINT) AS tw,
               CAST(count(*) AS HUGEINT) AS n FROM wt),
s AS (
  SELECT doc_id, w,
         sum(w) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hi
  FROM wt
)
SELECT s.doc_id, CAST(s.w AS BIGINT) AS weight,
       CAST(({_f_hi}) - ({_f_lo}) AS BIGINT) AS n_copies
FROM s, tot"""

    sqls["repetition_stats"] = r"""WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
  FROM documents
),
g AS (
  SELECT doc_id, l[u.i] || ' ' || l[u.i + 1] AS gram
  FROM t, UNNEST(generate_series(1, len(l) - 1)) AS u(i)
  WHERE len(l) >= 2
),
c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
a AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS nd, CAST(max(c) AS BIGINT) AS mx
  FROM c GROUP BY doc_id
)
SELECT t.doc_id, coalesce(a.n, 0) AS n_2grams,
       coalesce(a.nd, 0) AS n_distinct,
       CASE WHEN a.n IS NULL THEN 0.0
            ELSE floor((1.0 - CAST(a.nd AS DOUBLE) / a.n) * 1000000 + 0.5)
                 / 1000000 END AS dup_2gram_ratio,
       CASE WHEN a.n IS NULL THEN 0.0
            ELSE floor((CAST(a.mx AS DOUBLE) / a.n) * 1000000 + 0.5)
                 / 1000000 END AS top_2gram_frac
FROM t LEFT JOIN a ON t.doc_id = a.doc_id"""

    from .dataops import PDF_LINE_WORDS

    # pdf_extract: the decoder's output must equal the text the encoder
    # embedded — line 1 = first PDF_LINE_WORDS ws-tokens of the doc,
    # line 2 = '(<id>) \\ tail' (the escape-path probe)
    sqls["pdf_extract"] = f"""SELECT doc_id,
       array_to_string(l[1:{PDF_LINE_WORDS}], ' ') || chr(10) ||
       '(' || CAST(doc_id AS VARCHAR) || ') ' || chr(92) || ' tail' AS text
FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
      FROM documents)
WHERE doc_id % {MEDIA_EVERY} = 0"""

    sqls["media_features"] = f"""WITH m AS (
  SELECT 'pdf://' || CAST(doc_id AS VARCHAR) || '/0' AS media_ref,
         16 * (4 + doc_id % 13) AS n_bytes
  FROM documents WHERE doc_id % {MEDIA_EVERY} = 0
),
d AS (
  SELECT media_ref, n_bytes,
         1 + ({_H60.format('media_ref')} % 1024) AS width,
         1 + (({_H60.format('media_ref')} >> 10) % 1024) AS height
  FROM m
)
SELECT media_ref, n_bytes, width, height,
       '[media ' || media_ref || ' ' || CAST(n_bytes AS VARCHAR) || 'B '
       || CAST(width AS VARCHAR) || 'x' || CAST(height AS VARCHAR) || ']'
         AS caption
FROM d"""

    from .dataops import CHUNK_S, CHUNK_W

    # chunk_windows: starts 0, s, 2s, ... while start < n_tokens; the
    # slice upper bound is clamped to n so trailing windows are shorter
    # (1-based inclusive DuckDB array slices).
    sqls["chunk_windows"] = f"""WITH t AS (
  SELECT doc_id, l, len(l) AS n
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM documents)
)
SELECT doc_id,
       i - 1 AS chunk_id,
       array_to_string(
         l[(i - 1) * {CHUNK_S} + 1
           : least((i - 1) * {CHUNK_S} + {CHUNK_W}, n)], ' ') AS chunk_text,
       least((i - 1) * {CHUNK_S} + {CHUNK_W}, n)
         - (i - 1) * {CHUNK_S} AS n_tokens
FROM t,
     UNNEST(generate_series(
       1, CAST(ceil(n * 1.0 / {CHUNK_S}) AS BIGINT))) AS u(i)"""

    from .dataops import CDC_D, CDC_M, CDC_W, CDC_WEIGHTS

    # cdc_chunks: the rolling polynomial hash is a fixed 16-term lag()
    # expression (weights embedded from the same CDC_WEIGHTS tuple the
    # engine uses); cut after pos when hash % CDC_D = 0 and pos >= W-1;
    # the doc tail closes the last chunk (UNION dedupes a coinciding
    # final cut).  chunk_h60 re-hashes the chunk substring with the
    # shared md5-prefix twin.
    hh = " + ".join(
        f"lag(code, {i}, 0) OVER w * {wgt}" if i else f"code * {wgt}"
        for i, wgt in enumerate(CDC_WEIGHTS)
    )
    sqls["cdc_chunks"] = f"""WITH chars AS (
  SELECT d.doc_id, g.i AS pos, unicode(substr(d.text, g.i + 1, 1)) AS code
  FROM documents d,
       UNNEST(generate_series(0, length(d.text) - 1)) AS g(i)
),
h AS (
  SELECT doc_id, pos, ({hh}) % {CDC_M} AS hh
  FROM chars WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
b AS (
  SELECT doc_id, pos + 1 AS cut FROM h
  WHERE pos >= {CDC_W - 1} AND hh % {CDC_D} = 0
  UNION
  SELECT doc_id, length(text) AS cut FROM documents WHERE length(text) > 0
),
c AS (
  SELECT doc_id, cut AS end_off,
         coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0)
           AS start_off,
         row_number() OVER (PARTITION BY doc_id ORDER BY cut) - 1
           AS chunk_id
  FROM b
)
SELECT c.doc_id, c.chunk_id, c.start_off, c.end_off,
       c.end_off - c.start_off AS chunk_len,
       ('0x' || substr(md5(substr(d.text, c.start_off + 1,
                                  c.end_off - c.start_off)), 1, 15))::BIGINT
         AS chunk_h60
FROM c JOIN documents d ON d.doc_id = c.doc_id"""

    from .dataops import SPAN_W

    # dup_span_stats: stride-1 SPAN_W-token windows over the augmented
    # view; an occurrence is duplicated iff its window occurs >= 2 times
    # corpus-wide; ratio is the integer floor(x*1e6+0.5) twin.
    sqls["dup_span_stats"] = f"""WITH {_AUG.strip()},
toks AS (
  SELECT doc_id, l, len(l) AS n
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM aug)
),
win AS (
  SELECT doc_id,
         CASE WHEN n < {SPAN_W} THEN array_to_string(l, ' ')
              ELSE array_to_string(l[i : i + {SPAN_W - 1}], ' ')
         END AS w
  FROM toks,
       UNNEST(generate_series(1, greatest(n - {SPAN_W - 1}, 1))) AS u(i)
),
wh AS (SELECT doc_id, {_H60.format('w')} AS h FROM win),
cnt AS (SELECT h, count(*) AS c FROM wh GROUP BY h),
per AS (
  SELECT wh.doc_id,
         count(*) AS n_windows,
         CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup
  FROM wh JOIN cnt USING (h)
  GROUP BY wh.doc_id
)
SELECT doc_id,
       n_windows,
       n_dup,
       ((n_dup * 2000000 + n_windows) // (2 * n_windows)) / 1000000.0
         AS dup_ratio
FROM per"""

    # dup_span_scrub: the REWRITE form of dup_span_stats — a window
    # starting at 1-based token i covers positions i .. least(i+W-1, n);
    # kept_text keeps uncovered tokens in order, n_removed counts
    # covered positions.
    sqls["dup_span_scrub"] = f"""WITH {_AUG.strip()},
toks AS (
  SELECT doc_id, l, len(l) AS n
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM aug)
),
win AS (
  SELECT doc_id, n, i,
         CASE WHEN n < {SPAN_W} THEN array_to_string(l, ' ')
              ELSE array_to_string(l[i : i + {SPAN_W - 1}], ' ')
         END AS w
  FROM toks,
       UNNEST(generate_series(1, greatest(n - {SPAN_W - 1}, 1))) AS u(i)
),
wh AS (SELECT doc_id, n, i, {_H60.format('w')} AS h FROM win),
cnt AS (SELECT h, count(*) AS c FROM wh GROUP BY h),
cov AS (
  SELECT DISTINCT wh.doc_id, p
  FROM wh JOIN cnt USING (h),
       UNNEST(generate_series(wh.i, least(wh.i + {SPAN_W - 1}, wh.n)))
         AS g(p)
  WHERE cnt.c >= 2
),
pos AS (
  SELECT doc_id, p, l[p] AS tok, n
  FROM toks, UNNEST(generate_series(1, n)) AS u(p)
)
SELECT pos.doc_id,
       coalesce(string_agg(CASE WHEN cov.p IS NULL THEN pos.tok END,
                           ' ' ORDER BY pos.p), '') AS kept_text,
       min(pos.n) AS n_tokens,
       count(cov.p) AS n_removed
FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
GROUP BY pos.doc_id"""

    return sqls
