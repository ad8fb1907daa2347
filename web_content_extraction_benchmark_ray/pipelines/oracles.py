"""DuckDB oracle SQL for the extraction queries.

Because the synthetic page template is classifier-provable
(sources/pagegen.py + tests/test_template_provable.py), every extractor's
expected output is a deterministic string function of ``documents.text`` —
so even the *extraction* pipelines get hash-verified ANSI-SQL oracles, not
just rows-only checks.  The SQL reconstructs the main-content paragraphs
(12-word chunks wrapped in the stopword glue) with pure string operations
and mirrors each extractor's block-separator and boilerplate contribution.

The string constants are imported from pagegen so Python and SQL can never
drift apart.
"""
from __future__ import annotations

from ..functions.text import tokenize_words, tokenize_ws
from ..sources import pagegen as pg

_NAV = " ".join(pg.NAV_ITEMS)
_ASIDE = " ".join(pg.ASIDE_ITEMS)
_REPLY = " ".join(pg.REPLY_ITEMS)
_FOOT = " ".join(pg.FOOTER_LINKS) + " " + pg.FOOTER_TAIL_TEXT

# Token-count constants of the template, derived from the same pagegen
# constants the renderer uses (so SQL and Python cannot drift):
_BODY_BP = " ".join(
    [pg.H1_TEXT] + pg.NAV_ITEMS + pg.ASIDE_ITEMS + pg.REPLY_ITEMS
    + pg.FOOTER_LINKS + [pg.FOOTER_TAIL_TEXT]
)
GLUE_WS = len(tokenize_ws(pg.PAR_PREFIX)) + len(tokenize_ws(pg.PAR_SUFFIX))
GLUE_WORDS = len(tokenize_words(pg.PAR_PREFIX)) + len(tokenize_words(pg.PAR_SUFFIX))
BP_WS_BODY = len(tokenize_ws(_BODY_BP))  # boilerplate ws tokens in <body>
BP_WS_PAGE = BP_WS_BODY + 3  # + title "Synthetic page <id>"
BP_WORDS_BODY = len(tokenize_words(_BODY_BP))  # \w+ tokens in <body>
# fixed tag census of the template body (verified against rendered pages in
# tests/test_oracle_constants.py): total tags = TAGS_CONST + n_paragraphs
TAGS_CONST = 31
TAG_COUNTS = {"h1": 1, "a": 13, "ul": 8, "div": 2}  # 'ul' counts <li>


def _q(s: str) -> str:
    """SQL single-quoted literal."""
    return "'" + s.replace("'", "''") + "'"


def _main_cte(sep_sql: str) -> str:
    """CTE producing (doc_id, main_text): the glue-wrapped 12-word chunk
    paragraphs joined by ``sep_sql`` (a SQL expression, e.g. chr(10))."""
    return f"""
WITH toks AS (
  SELECT doc_id, u.i AS i, l[u.i] AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
        FROM documents) t,
       UNNEST(generate_series(1, len(l))) AS u(i)
),
chunks AS (
  SELECT doc_id,
         CAST(floor((i - 1) / {pg.CHUNK_WORDS}) AS INTEGER) AS ci,
         string_agg(tok, ' ' ORDER BY i) AS chunk
  FROM toks GROUP BY doc_id, ci
),
mains AS (
  SELECT doc_id,
         string_agg({_q(pg.PAR_PREFIX)} || ' ' || chunk || ' ' || {_q(pg.PAR_SUFFIX)},
                    {sep_sql} ORDER BY ci) AS main_text
  FROM chunks GROUP BY doc_id
)"""


def _select(model: str, plaintext_expr: str) -> str:
    return (
        f"SELECT d.doc_id AS doc_id, {_q(model)} AS model, "
        f"{plaintext_expr} AS plaintext "
        "FROM documents d JOIN mains m ON d.doc_id = m.doc_id"
    )


def extraction_oracle_sql() -> dict[str, str]:
    newline = "chr(10)"
    space = "' '"
    sqls = {}
    for model in ("bte", "density", "readability", "cascade", "topnode",
                  "plaintext", "leafmodel", "leafmodel_seq",
                  "leafmodel_seq2"):
        sqls[f"extract_{model}"] = _main_cte(newline) + _select(
            model, "m.main_text"
        )
    for model in ("justext", "ensemble", "ensemble_best", "ensemble_weighted"):
        sqls[f"extract_{model}"] = _main_cte(space) + _select(
            model, "m.main_text"
        )
    # extract_article: title provably comes from the <title> tag ("Synthetic
    # page {doc_id}" — no og:title, no separators, the only h1 is the
    # link-wrapped brand), byline/pub_date are provably absent (no author/
    # date metas, no rel=author, no byline-named class/id, no <time>), and
    # the body is the cascade zone harvest (same proof as extract_cascade).
    sqls["extract_article"] = _main_cte(newline) + (
        "SELECT d.doc_id AS doc_id, "
        "'Synthetic page ' || CAST(d.doc_id AS VARCHAR) AS title, "
        "'' AS byline, '' AS pub_date, m.main_text AS article_text "
        "FROM documents d JOIN mains m ON d.doc_id = m.doc_id"
    )
    sqls["extract_whole_text"] = _main_cte(space) + _select(
        "whole_text",
        f"'Synthetic page ' || CAST(d.doc_id AS VARCHAR) || ' ' || "
        f"{_q(pg.H1_TEXT)} || ' ' || {_q(_NAV)} || ' ' || m.main_text || ' ' || "
        f"{_q(_ASIDE)} || ' ' || {_q(_REPLY)} || ' ' || {_q(_FOOT)}",
    )
    sqls["extract_body_text"] = _main_cte(space) + _select(
        "body_text",
        f"{_q(pg.H1_TEXT)} || ' ' || {_q(_NAV)} || ' ' || m.main_text || ' ' || "
        f"{_q(_ASIDE)} || ' ' || {_q(_REPLY)} || ' ' || {_q(_FOOT)}",
    )
    _bullets = lambda items: "\n".join(f"* {t}" for t in items)  # noqa: E731
    sqls["extract_layout"] = _main_cte(newline) + _select(
        "layout",
        f"{_q(pg.H1_TEXT)} || chr(10) || {_q(_bullets(pg.NAV_ITEMS))} || chr(10) || "
        f"m.main_text || chr(10) || {_q(_bullets(pg.ASIDE_ITEMS))} || chr(10) || "
        f"{_q(_REPLY)} || chr(10) || {_q(_FOOT)}",
    )
    sqls["extract_tagclean"] = _main_cte(space) + _select(
        "tagclean",
        f"{_q(pg.H1_TEXT)} || ' ' || m.main_text || ' ' || {_q(_REPLY)}",
    )
    # span-sequence invariant (north rule): reconstruct bte's output span
    # sequence — one 'text' span per main paragraph in order, then for
    # every 10th doc one 'media' span with the deterministic layout text —
    # serialized with US/RS separators exactly like the Ray side
    rs, us = "chr(30)", "chr(31)"
    sqls["extract_spans_signature"] = _main_cte("'\x01'") + f""",
par AS (
  SELECT doc_id,
         CAST(floor((i - 1) / {pg.CHUNK_WORDS}) AS INTEGER) AS ci,
         {_q(pg.PAR_PREFIX)} || ' ' || string_agg(tok, ' ' ORDER BY i)
           || ' ' || {_q(pg.PAR_SUFFIX)} AS ptext
  FROM toks GROUP BY doc_id, ci
),
sigs AS (
  SELECT doc_id,
         string_agg('text' || {us} || ptext || {us} || {us} || ci,
                    {rs} ORDER BY ci) AS body_sig,
         max(ci) + 1 AS npars
  FROM par GROUP BY doc_id
)
SELECT d.doc_id AS doc_id, 'bte' AS model,
       s.body_sig ||
       CASE WHEN d.doc_id % 10 = 0
            THEN {rs} || 'media' || {us} ||
                 '[media pdf://' || CAST(d.doc_id AS VARCHAR) || '/0 layout]'
                 || {us} || 'pdf://' || CAST(d.doc_id AS VARCHAR) || '/0'
                 || {us} || CAST(s.npars AS VARCHAR)
            ELSE '' END AS spans_sig
FROM documents d JOIN sigs s ON d.doc_id = s.doc_id"""

    # media path: every 10th doc carries one media span; the layout-parse
    # stub's output is deterministic from the ref (functions/media.py)
    sqls["extract_subproc"] = _main_cte(space) + _select(
        "subproc_whole_text",
        f"'Synthetic page ' || CAST(d.doc_id AS VARCHAR) || ' ' || "
        f"{_q(pg.H1_TEXT)} || ' ' || {_q(_NAV)} || ' ' || m.main_text || ' ' || "
        f"{_q(_ASIDE)} || ' ' || {_q(_REPLY)} || ' ' || {_q(_FOOT)}",
    )
    sqls["ingest_decode"] = "SELECT doc_id, text FROM documents"
    sqls["media_spans"] = (
        "SELECT doc_id, "
        "'pdf://' || CAST(doc_id AS VARCHAR) || '/0' AS media_ref, "
        "'[media pdf://' || CAST(doc_id AS VARCHAR) || '/0 layout]' AS media_text "
        "FROM documents WHERE doc_id % 10 = 0"
    )
    return sqls


# ---------------------------------------------------------------------------
# Evaluation / complexity / feature oracles.
#
# Independent predictions from the provable template: the truth is the main
# paragraphs, so per-doc token counts are pure functions of the word count:
#   nw    = ws-token count of text
#   npars = ceil(nw / CHUNK_WORDS)
#   m     = nw + GLUE_WS * npars           (truth token count)
# bte output tokens == truth tokens -> rouge/levenshtein = 1.0 exactly;
# whole_text output = truth + BP_WS_PAGE boilerplate tokens, with the truth
# a contiguous-in-order subset -> rec = 1, prec = m / (m + BP_WS_PAGE),
# levenshtein ratio = 2m / (2m + BP_WS_PAGE).

_BASE_CTE = f"""
WITH base AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS nw,
         CAST(ceil(len(regexp_split_to_array(trim(text), '\\s+')) / {float(pg.CHUNK_WORDS)}) AS BIGINT) AS npars
  FROM documents
),
counts AS (
  SELECT doc_id, lang, nw, npars, nw + {GLUE_WS} * npars AS m FROM base
)"""

_R6 = "floor({} * 1000000 + 0.5) / 1000000"


def mean6_sql(col: str) -> str:
    """Order-independent round6 mean, mirroring evalpipe.exact_mean6:
    per-element micro-unit quantization -> exact BIGINT sum -> one
    divide -> round6 (a float avg() drifts from the distributed partial
    sums in the last ulp and can flip the rounding boundary)."""
    s = (
        f"CAST(sum(CAST(floor({col} * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
        " / 1000000"
    )
    return _R6.format(f"(({s}) / count(*))")


def eval_oracle_sql() -> dict[str, str]:
    bp = BP_WS_PAGE
    sqls = {}
    sqls["eval_rouge"] = _BASE_CTE + f"""
SELECT doc_id, model, lang AS dataset, prec, rec, f1 FROM (
  SELECT doc_id, lang, 'bte' AS model, 1.0 AS prec, 1.0 AS rec, 1.0 AS f1 FROM counts
  UNION ALL
  SELECT doc_id, lang, 'whole_text' AS model,
         CAST(m AS DOUBLE) / (m + {bp}) AS prec,
         1.0 AS rec,
         2 * (CAST(m AS DOUBLE) / (m + {bp})) * 1.0 / ((CAST(m AS DOUBLE) / (m + {bp})) + 1.0) AS f1
  FROM counts
)"""
    sqls["eval_levenshtein"] = _BASE_CTE + f"""
SELECT doc_id, model, lang AS dataset, dist FROM (
  SELECT doc_id, lang, 'bte' AS model, 1.0 AS dist FROM counts
  UNION ALL
  SELECT doc_id, lang, 'whole_text' AS model,
         2.0 * m / (2 * m + {bp}) AS dist FROM counts
)"""
    rouge_f1 = (
        f"(SELECT doc_id, lang AS dataset, 'bte' AS model, 1.0 AS f1 FROM counts "
        f"UNION ALL "
        f"SELECT doc_id, lang AS dataset, 'whole_text' AS model, "
        f"2 * (CAST(m AS DOUBLE) / (m + {bp})) * 1.0 / ((CAST(m AS DOUBLE) / (m + {bp})) + 1.0) AS f1 "
        f"FROM counts)"
    )
    sqls["eval_agg_by_dataset"] = _BASE_CTE + f"""
SELECT model, dataset,
       {mean6_sql('f1')} AS mean_score,
       {_R6.format('quantile_cont(f1, 0.5)')} AS median_score,
       count(*) AS n
FROM {rouge_f1} s GROUP BY model, dataset"""
    sqls["eval_agg_micro"] = _BASE_CTE + f"""
SELECT model,
       {mean6_sql('f1')} AS mean_score,
       {_R6.format('quantile_cont(f1, 0.5)')} AS median_score,
       count(*) AS n
FROM {rouge_f1} s GROUP BY model"""
    sqls["eval_agg_macro"] = _BASE_CTE + f"""
SELECT model, {mean6_sql('mean_score')} AS macro_mean FROM (
  SELECT model, dataset, {mean6_sql('f1')} AS mean_score
  FROM {rouge_f1} s GROUP BY model, dataset
) GROUP BY model"""
    sqls["eval_quantiles"] = _BASE_CTE + f"""
SELECT model, q, value FROM (
  SELECT model, 0.25 AS q, {_R6.format('quantile_cont(f1, 0.25)')} AS value
  FROM {rouge_f1} s GROUP BY model
  UNION ALL
  SELECT model, 0.75 AS q, {_R6.format('quantile_cont(f1, 0.75)')} AS value
  FROM {rouge_f1} s GROUP BY model
)"""
    # 25 equal [0,1] slices, right edge inclusive in the LAST bin only
    # (matplotlib's hist rule, which evalpipe.score_histograms mirrors);
    # floor(f1*25) on identical IEEE doubles is deterministic, so the
    # engine's numpy bincount and this SQL agree bit-for-bit.
    sqls["eval_score_histogram"] = _BASE_CTE + f"""
SELECT model, bin, count(*) AS n FROM (
  SELECT model,
         least(CAST(floor(least(greatest(f1, 0.0), 1.0) * 25) AS BIGINT),
               24) AS bin
  FROM {rouge_f1} s
) GROUP BY model, bin"""
    return sqls


def complexity_oracle_sql() -> dict[str, str]:
    t = f"(nw + {GLUE_WORDS} * npars)"  # truth \w+ tokens
    s = f"({t} + {BP_WORDS_BODY})"  # src body \w+ tokens
    compl = f"1.0 - least(1.0, greatest(0.0, CAST({t} AS DOUBLE) / {s}))"
    sqls = {}
    sqls["complexity"] = _BASE_CTE + f"""
SELECT doc_id, lang AS dataset, {compl} AS complexity FROM counts"""
    qlist = "[0.25, 0.33, 0.5, 0.66, 0.75]"
    sqls["complexity_quantiles"] = _BASE_CTE + f""",
c AS (SELECT {compl} AS complexity FROM counts),
ql AS (SELECT quantile_cont(complexity, {qlist}) AS v FROM c)
SELECT {qlist}[u.i] AS q, {_R6.format('v[u.i]')} AS value
FROM ql, UNNEST(generate_series(1, 5)) AS u(i)"""
    sqls["html_features"] = _BASE_CTE + f"""
SELECT doc_id, {', '.join(f'{e} AS {n}' for n, e in html_feature_exprs())}
FROM counts"""
    return sqls


def html_feature_exprs() -> list[tuple[str, str]]:
    """(name, SQL expr over the ``counts`` CTE) for the 15 tag features —
    shared by the html_features oracle and the classifier oracle so the
    two can never drift."""
    t = f"(nw + {GLUE_WORDS} * npars)"  # truth \w+ tokens
    n_tags = f"({TAGS_CONST} + npars)"
    out: list[tuple[str, str]] = []
    for f in ("h1", "h2", "h3", "h4", "h5", "h6", "p", "ul", "table", "a",
              "div", "br", "strong", "em"):
        if f == "p":
            expr = f"CAST(npars + 1 AS DOUBLE) / {n_tags}"
        elif f in TAG_COUNTS:
            expr = f"CAST({TAG_COUNTS[f]} AS DOUBLE) / {n_tags}"
        else:
            expr = "0.0"
        out.append((f, expr))
    out.append(
        (
            "html_to_non_html",
            f"CAST({n_tags} AS DOUBLE) / ({t} + {BP_WORDS_BODY})",
        )
    )
    return out
