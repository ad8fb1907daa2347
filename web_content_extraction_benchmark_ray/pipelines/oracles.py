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

from ..sources import pagegen as pg

_NAV = " ".join(pg.NAV_ITEMS)
_ASIDE = " ".join(pg.ASIDE_ITEMS)
_REPLY = " ".join(pg.REPLY_ITEMS)
_FOOT = " ".join(pg.FOOTER_LINKS) + " " + pg.FOOTER_TAIL_TEXT


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
    for model in ("bte", "density", "readability"):
        sqls[f"extract_{model}"] = _main_cte(newline) + _select(
            model, "m.main_text"
        )
    for model in ("justext", "ensemble"):
        sqls[f"extract_{model}"] = _main_cte(space) + _select(
            model, "m.main_text"
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
    sqls["extract_tagclean"] = _main_cte(space) + _select(
        "tagclean",
        f"{_q(pg.H1_TEXT)} || ' ' || m.main_text || ' ' || {_q(_REPLY)}",
    )
    # media path: every 10th doc carries one media span; the layout-parse
    # stub's output is deterministic from the ref (functions/media.py)
    sqls["media_spans"] = (
        "SELECT doc_id, "
        "'pdf://' || CAST(doc_id AS VARCHAR) || '/0' AS media_ref, "
        "'[media pdf://' || CAST(doc_id AS VARCHAR) || '/0 layout]' AS media_text "
        "FROM documents WHERE doc_id % 10 = 0"
    )
    return sqls
