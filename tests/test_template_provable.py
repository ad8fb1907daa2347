"""The load-bearing guarantee behind the DuckDB oracles: on the synthetic
page template every extractor's output is the deterministic function of the
source text that ``pagegen.EXPECTED_BY_MODEL`` (and the SQL in
pipelines/oracles.py) predicts — for arbitrary word-soup inputs."""
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from web_content_extraction_benchmark_ray.functions.extractors import (
    get_extractor,
    list_extractors,
)
from web_content_extraction_benchmark_ray.sources import pagegen as pg

VOCAB = (
    "the a key order sort table scan merge part window small hash join batch "
    "stream spark dup row data value big slow fast query line filter agg "
    "column vector customer group 0 1 42 2024 x1 z9"
).split()


def test_all_models_have_expectations():
    assert set(list_extractors()) == set(pg.EXPECTED_BY_MODEL)


@pytest.mark.parametrize("model", sorted(pg.EXPECTED_BY_MODEL))
def test_template_provable_randomized(model):
    rng = random.Random(f"tpl-{model}")
    fn = get_extractor(model)
    for _ in range(25):
        n = rng.choice([10, 11, 12, 13, 24, 25, 48, 99])
        text = " ".join(rng.choice(VOCAB) for _ in range(n))
        doc_id = rng.randint(0, 10**9)
        html = pg.render_page(doc_id, text)
        assert fn(html) == pg.EXPECTED_BY_MODEL[model](doc_id, text)


@given(
    st.integers(min_value=0, max_value=10**9),
    st.lists(st.sampled_from(VOCAB), min_size=10, max_size=99),
)
@settings(max_examples=40, deadline=None)
def test_template_provable_hypothesis(doc_id, words):
    text = " ".join(words)
    html = pg.render_page(doc_id, text)
    for model in ("justext", "density", "bte"):
        assert get_extractor(model)(html) == pg.EXPECTED_BY_MODEL[model](
            doc_id, text
        )


def test_heavy_doc_still_provable():
    text = " ".join(["alpha beta the gamma"] * 50 * 5)
    html = pg.render_page(97, text)
    for model in ("justext", "bte", "density"):
        assert get_extractor(model)(html) == pg.EXPECTED_BY_MODEL[model](97, text)
