"""Corpus reader + byte-ingestion tests (reference S2-S11 / F4 parity):
fixture directories in tmp_path per format, id stability, dedup-on-read,
encoding round-trips."""
import gzip
import json

import pytest

from web_content_extraction_benchmark_ray.functions.text import sha256_hex
from web_content_extraction_benchmark_ray.sources.ingest import (
    decode_page_bytes,
    detect_encoding,
    maybe_gunzip,
)
from web_content_extraction_benchmark_ray.sources.readers import (
    JsonTruthReader,
    PairedReader,
    SelectorReader,
    WrappedReader,
    corpus_to_dataset,
    extract_with_class_marker,
    read_corpus,
)


# ------------------------------------------------------------------ ingest
def test_decode_utf8_plain_and_gzip():
    s = "héllo wörld — ✓"
    assert decode_page_bytes(s.encode("utf-8")) == s
    assert decode_page_bytes(gzip.compress(s.encode("utf-8"))) == s


def test_decode_cp1252_fallback():
    data = b"caf\xe9 \x93quoted\x94"  # cp1252 bytes, invalid utf-8
    assert detect_encoding(data) == "cp1252"
    assert decode_page_bytes(data) == "café “quoted”"


def test_decode_utf16_bom_stripped():
    s = "page body"
    for enc, bom in (("utf-16-le", b"\xff\xfe"), ("utf-16-be", b"\xfe\xff")):
        out = decode_page_bytes(bom + s.encode(enc))
        assert out == s  # BOM consumed, not leaked into the text


def test_gunzip_magic_only():
    assert maybe_gunzip(b"\x1f\x8b" + gzip.compress(b"x")[2:]) == b"x"
    assert maybe_gunzip(b"plain") == b"plain"


# ----------------------------------------------------------------- readers
@pytest.fixture()
def wrapped_corpus(tmp_path):
    (tmp_path / "orig").mkdir()
    (tmp_path / "clean").mkdir()
    (tmp_path / "orig" / "a.html").write_text(
        "<text id=1>\n<p>Main body here</p>\n</text>"
    )
    (tmp_path / "clean" / "a.txt").write_text("URL: http://x\nMain body here\n")
    return str(tmp_path)


def test_wrapped_reader(wrapped_corpus):
    pages = dict(WrappedReader(wrapped_corpus).read())
    truths = dict(WrappedReader(wrapped_corpus, ground_truth=True).read())
    assert len(pages) == 1 and len(truths) == 1
    (pid, rec), = pages.items()
    assert pid == list(truths)[0]  # same id for html and truth sides
    assert "<text" not in rec["html"]  # envelope stripped
    assert "<p>Main body here</p>" in rec["html"]
    assert truths[pid]["plaintext"] == "Main body here"  # URL: line dropped


def test_paired_reader(tmp_path):
    (tmp_path / "HTML").mkdir()
    (tmp_path / "Corrected").mkdir()
    (tmp_path / "HTML" / "x.html").write_text("<p>Body</p>")
    (tmp_path / "Corrected" / "x.html.corrected.txt").write_text("Body\n")
    r = dict(PairedReader(str(tmp_path), ground_truth=True).read())
    (pid, rec), = r.items()
    assert pid == sha256_hex(b"<p>Body</p>")
    assert rec["plaintext"] == "Body"


def test_selector_reader_and_marker_extraction(tmp_path):
    html = (
        "<html><body><div class='nav'>Menu</div>"
        "<div class='x-nc-sel1'><p>First para</p><p>Second para</p></div>"
        "<span class='x-nc-sel2'>inline tail</span></body></html>"
    )
    (tmp_path / "p.html").write_text(html)
    truth = dict(SelectorReader(str(tmp_path), ground_truth=True).read())
    (pid, rec), = truth.items()
    assert rec["plaintext"] == "First para\nSecond para\ninline tail"
    assert "Menu" not in rec["plaintext"]
    assert extract_with_class_marker("<p>no marker</p>", "x-nc-sel") == ""


def test_jsontruth_reader_gzip_id_stability(tmp_path):
    html = b"<html><body>Article text</body></html>"
    (tmp_path / "case1.html.gz").write_bytes(gzip.compress(html))
    (tmp_path / "ground-truth.json").write_text(
        json.dumps({"case1": {"articleBody": "Article text", "url": "u"}})
    )
    pages = dict(JsonTruthReader(str(tmp_path)).read())
    (pid, rec), = pages.items()
    assert pid == sha256_hex(html)  # hash of DECOMPRESSED bytes
    assert rec["html"] == html.decode()
    truth = dict(JsonTruthReader(str(tmp_path), ground_truth=True).read())
    assert truth[pid]["plaintext"] == "Article text"


def test_registry_dispatch_and_unknown(tmp_path):
    with pytest.raises(ValueError, match="unknown corpus kind"):
        read_corpus("nope", str(tmp_path))
    (tmp_path / "orig").mkdir()
    r = read_corpus("wrapped", str(tmp_path))
    assert isinstance(r, WrappedReader)


def test_corpus_to_dataset_dedups(ray_session, tmp_path):
    (tmp_path / "HTML").mkdir()
    (tmp_path / "HTML" / "a.html").write_text("<p>Same</p>")
    (tmp_path / "HTML" / "b.html").write_text("<p>Same</p>")  # duplicate bytes
    (tmp_path / "HTML" / "c.html").write_text("<p>Other</p>")
    ds = corpus_to_dataset(PairedReader(str(tmp_path)))
    rows = ds.take_all()
    assert len(rows) == 2  # content-hash dedup on read
    assert {r["page_id"] for r in rows} == {
        sha256_hex(b"<p>Same</p>"), sha256_hex(b"<p>Other</p>")
    }


# ------------------------------------------------- leafmodel / subproc e2e
def test_leafmodel_matches_density_on_template():
    from web_content_extraction_benchmark_ray.functions.extractors import (
        get_extractor,
    )
    from web_content_extraction_benchmark_ray.sources import pagegen

    html = pagegen.render_page(3, "alpha beta gamma " * 30)
    assert get_extractor("leafmodel")(html) == get_extractor("density")(html)


def test_leafmodel_drops_linky_and_short_blocks():
    from web_content_extraction_benchmark_ray.functions.extractors import (
        get_extractor,
    )

    html = (
        "<body><ul><li><a href='/'>NavOne</a></li></ul>"
        "<p>" + "word " * 30 + "</p><div>tiny</div></body>"
    )
    out = get_extractor("leafmodel")(html)
    assert "NavOne" not in out and "tiny" not in out
    assert out.startswith("word word")


def test_subproc_stage_roundtrip(ray_session):
    import pyarrow as pa

    from web_content_extraction_benchmark_ray.functions.extractors import (
        get_extractor,
    )
    from web_content_extraction_benchmark_ray.stages.subproc import (
        SubprocExtractStage,
    )

    html = "<html><body><p>Hello subprocess world</p></body></html>"
    stage = SubprocExtractStage(model="whole_text")
    out = stage(
        pa.table(
            {
                "doc_id": pa.array(["d1"], pa.string()),
                "html": pa.array([html], pa.large_string()),
            }
        )
    )
    assert out.column("plaintext")[0].as_py() == get_extractor("whole_text")(html)
    assert out.column("model")[0].as_py() == "subproc_whole_text"
    assert out.column("error")[0].as_py() == ""


def test_verticals_reader(tmp_path):
    from web_content_extraction_benchmark_ray.sources.readers import (
        VerticalsReader,
    )

    for vert in ("siteA", "siteB"):
        (tmp_path / vert / "original").mkdir(parents=True)
        (tmp_path / vert / "gold").mkdir(parents=True)
        (tmp_path / vert / "original" / "case1.html").write_text(
            f"<html><body><p>{vert} body</p></body></html>"
        )
        (tmp_path / vert / "gold" / "case1.html").write_text(f"{vert} body")
    pages = dict(VerticalsReader(str(tmp_path)).read())
    truths = dict(VerticalsReader(str(tmp_path), ground_truth=True).read())
    assert len(pages) == 2 and len(truths) == 2
    cases = sorted(r["case"] for r in pages.values())
    assert cases == ["siteA_case1", "siteB_case1"]  # vertical-prefixed ids
    assert set(pages) == set(truths)  # same content-hash ids both sides
    for pid, rec in truths.items():
        vert = rec["case"].split("_")[0]
        assert rec["plaintext"] == f"{vert} body"


def test_casedir_reader(tmp_path):
    from web_content_extraction_benchmark_ray.sources.readers import (
        CaseDirReader,
    )

    (tmp_path / "caseX").mkdir()
    (tmp_path / "caseX" / "source.html").write_text(
        "<html><body><div>Main text here</div><script>x()</script></body></html>"
    )
    (tmp_path / "caseX" / "expected.html").write_text(
        "<html><body><p>Main   text</p><p>here</p></body></html>"
    )
    pages = dict(CaseDirReader(str(tmp_path)).read())
    truths = dict(CaseDirReader(str(tmp_path), ground_truth=True).read())
    (pid, rec), = truths.items()
    assert pid in pages
    # truth = PARSED body text of expected.html, whitespace-squeezed
    assert rec["plaintext"] == "Main text here"


def test_jsonl_roundtrip_and_sorted(tmp_path):
    from web_content_extraction_benchmark_ray.sources.jsonl import (
        jsonl_to_dict,
        read_jsonl,
        write_jsonl_sorted,
    )

    path = str(tmp_path / "answers.jsonl")
    n = write_jsonl_sorted(
        {"zzz": {"plaintext": "z", "model": "bte"},
         "aaa": {"plaintext": "a", "model": "bte"}},
        path,
    )
    assert n == 2
    rows = list(read_jsonl(path))
    assert [r["page_id"] for r in rows] == ["aaa", "zzz"]  # sorted sink
    d = jsonl_to_dict(path)
    assert d["aaa"] == {"plaintext": "a", "model": "bte"}

    # gz transparency
    gz = str(tmp_path / "answers.jsonl.gz")
    write_jsonl_sorted(rows, gz)
    assert [r["page_id"] for r in read_jsonl(gz)] == ["aaa", "zzz"]


def test_dataset_name_dispatch_covers_all_eight():
    """Reference read_raw_dataset parity (dataset_readers.py:345-370):
    every reference dataset NAME resolves to a format reader with the
    right specialization."""
    from web_content_extraction_benchmark_ray.sources.readers import (
        DATASET_KINDS,
        READERS,
        read_dataset,
    )

    assert sorted(DATASET_KINDS) == [
        "cetd", "cleaneval", "cleanportaleval", "dragnet",
        "google-trends-2017", "l3s-gn1", "readability", "scrapinghub",
    ]
    for name, (kind, _) in DATASET_KINDS.items():
        r = read_dataset(name, "/nonexistent")
        assert isinstance(r.inner, READERS[kind]), name
        assert r.name == name

    r = read_dataset("cleanportaleval", "/nonexistent")
    assert (r.inner.orig_dir, r.inner.clean_dir) == ("input", "GoldStandard")
    r = read_dataset("google-trends-2017", "/nonexistent")
    assert (r.inner.marker, r.inner.attr) == ("1", "__boilernet_label")
    r = read_dataset("l3s-gn1", "/nonexistent")
    assert (r.inner.marker, r.inner.attr) == ("x-nc-sel", "class")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown dataset"):
        read_dataset("nope", "/x")


def test_boilernet_attribute_marker(tmp_path):
    """google-trends-2017 style: [__boilernet_label="1"] attribute
    EQUALITY selects truth nodes (label "10" must not match)."""
    from web_content_extraction_benchmark_ray.sources.readers import (
        read_dataset,
    )

    html = (
        '<html><body><p __boilernet_label="1">keep me</p>'
        '<p __boilernet_label="10">not me</p>'
        "<p>boiler</p>"
        '<div __boilernet_label="1"><span>nested kept</span></div>'
        "</body></html>"
    )
    (tmp_path / "a.html").write_text(html)
    truth = dict(
        read_dataset("google-trends-2017", str(tmp_path),
                     ground_truth=True).read()
    )
    assert len(truth) == 1
    rec = next(iter(truth.values()))
    assert rec["dataset"] == "google-trends-2017"
    assert "keep me" in rec["plaintext"]
    assert "nested kept" in rec["plaintext"]
    assert "not me" not in rec["plaintext"]
    assert "boiler" not in rec["plaintext"]


def test_cleanportaleval_directory_layout(tmp_path):
    from web_content_extraction_benchmark_ray.sources.readers import (
        read_dataset,
    )

    (tmp_path / "input").mkdir()
    (tmp_path / "GoldStandard").mkdir()
    (tmp_path / "input" / "c1.html").write_text(
        "<text><p>hello portal</p></text>"
    )
    (tmp_path / "GoldStandard" / "c1.txt").write_text(
        "URL: http://x\nhello portal"
    )
    pages = dict(read_dataset("cleanportaleval", str(tmp_path)).read())
    truth = dict(
        read_dataset("cleanportaleval", str(tmp_path),
                     ground_truth=True).read()
    )
    (page,) = pages.values()
    (t,) = truth.values()
    assert page["dataset"] == t["dataset"] == "cleanportaleval"
    assert "hello portal" in page["html"]
    assert t["plaintext"] == "hello portal"
