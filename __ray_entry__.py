"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship extraction pipeline at sf0.001 (spans synthesis ->
  reassembly shuffle -> multi-model extraction), returns a lazy Dataset.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset / DataFrame /
  Arrow table whose column names match the oracle SQL exactly.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL per query where the operator
  is SQL-expressible (the classifier-provable page template makes even the
  extraction pipelines SQL-checkable — see pipelines/oracles.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from web_content_extraction_benchmark_ray.pipelines.queries import (
        extraction_query,
    )

    return extraction_query("bte")("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from web_content_extraction_benchmark_ray.pipelines.queries import (
        eval_queries,
        extraction_queries,
    )

    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        analytics_queries,
    )
    from web_content_extraction_benchmark_ray.pipelines.dataops import (
        dataops_queries,
    )

    out: dict[str, Callable[[str], Any]] = {}
    out.update(extraction_queries())
    out.update(eval_queries())
    from web_content_extraction_benchmark_ray.pipelines.events import (
        events_queries,
    )

    from web_content_extraction_benchmark_ray.pipelines.classify import (
        cluster_alignment,
        complexity_classify,
    )

    from web_content_extraction_benchmark_ray.pipelines.curation import (
        curation_queries,
    )

    out.update(dataops_queries())
    out.update(analytics_queries())
    out.update(events_queries())
    out.update(curation_queries())
    from web_content_extraction_benchmark_ray.pipelines.project import (
        feature_project,
    )

    out["complexity_classify"] = complexity_classify
    out["cluster_alignment"] = cluster_alignment
    out["feature_project"] = feature_project
    from web_content_extraction_benchmark_ray.pipelines.tsne import (
        tsne_project,
    )

    # driver-side viz-scale operator (reference complexity.py:137-144);
    # 300 coupled float iterations -> no SQL oracle, rows-only check
    out["tsne_project"] = tsne_project
    from web_content_extraction_benchmark_ray.pipelines.training import (
        leaf_examples,
        leaf_seq_examples,
        leafmodel_seq2_train,
        leafmodel_train,
    )

    out["leaf_examples"] = leaf_examples
    out["leafmodel_train"] = leafmodel_train
    out["leaf_seq_examples"] = leaf_seq_examples
    out["leafmodel_seq2_train"] = leafmodel_seq2_train
    return out


def oracle_sql() -> dict[str, str]:
    from web_content_extraction_benchmark_ray.pipelines.oracles import (
        complexity_oracle_sql,
        eval_oracle_sql,
        extraction_oracle_sql,
    )

    from web_content_extraction_benchmark_ray.pipelines.dataops_oracles import (
        dataops_oracle_sql,
    )

    out: dict[str, str] = {}
    out.update(extraction_oracle_sql())
    out.update(eval_oracle_sql())
    out.update(complexity_oracle_sql())
    from web_content_extraction_benchmark_ray.pipelines.curation import (
        curation_oracle_sql,
    )

    out.update(dataops_oracle_sql())
    out.update(curation_oracle_sql())
    from web_content_extraction_benchmark_ray.pipelines.analytics import (
        analytics_oracle_sql,
    )

    out.update(analytics_oracle_sql())
    from web_content_extraction_benchmark_ray.pipelines.events import (
        events_oracle_sql,
    )

    out.update(events_oracle_sql())
    from web_content_extraction_benchmark_ray.pipelines.classify import (
        classify_oracle_sql,
        cluster_alignment_oracle_sql,
    )

    from web_content_extraction_benchmark_ray.pipelines.project import (
        project_oracle_sql,
    )

    out["complexity_classify"] = classify_oracle_sql()
    out["cluster_alignment"] = cluster_alignment_oracle_sql()
    out["feature_project"] = project_oracle_sql()
    from web_content_extraction_benchmark_ray.pipelines.training import (
        leaf_examples_sql,
        leaf_seq_examples_sql,
        leafmodel_seq2_train_sql,
        leafmodel_train_sql,
    )

    out["leaf_examples"] = leaf_examples_sql()
    out["leafmodel_train"] = leafmodel_train_sql()
    out["leaf_seq_examples"] = leaf_seq_examples_sql()
    out["leafmodel_seq2_train"] = leafmodel_seq2_train_sql()
    return out
