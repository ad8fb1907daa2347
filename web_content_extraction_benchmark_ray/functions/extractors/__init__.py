"""From-scratch extraction algorithms (reference capability family
``extractors/extractors.py``, re-derived from the published algorithms —
no code copied).

Registry: any callable registered here is a pure ``html -> plaintext``
function; the extraction stage (stages/extract.py) wraps it with the
reference's never-fail-the-job semantics (error -> empty output + error
note, reference ``extract.py:106-119``).
"""
from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, Callable[[str], str]] = {}

# Shared-input fast path: extractors that can consume a pre-parsed DOM
# ("root") or pre-segmented blocks ("blocks") register a second, read-only
# form here; the extraction stage then parses/segments each document ONCE
# for all such models (a re-parse per model was ~30% of extraction time).
# Only NON-MUTATING consumers may register (tagclean drop_tags the tree,
# so it re-parses).
SHARED_FORMS: dict[str, tuple[str, Callable]] = {}


def register_extractor(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def register_shared(name: str, kind: str, fn) -> None:
    assert kind in ("root", "blocks")
    SHARED_FORMS[name] = (kind, fn)


def get_extractor(name: str) -> Callable[[str], str]:
    _ensure_loaded()
    return _REGISTRY[name]


def list_extractors() -> list[str]:
    """Reference analogue: ``extractors.py:212-221`` (globals() scan)."""
    _ensure_loaded()
    return sorted(_REGISTRY)


def _ensure_loaded():
    # import for registration side effects
    from . import (  # noqa: F401
        baselines,
        bte,
        cascade,
        density,
        ensemble,
        justext,
        layout,
        leafmodel,
        plaintext,
        readability,
        tagclean,
        topnode,
    )


_ensure_loaded()
