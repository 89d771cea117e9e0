"""UI string translation catalog (dev tool, not imported by the app).

Behavioral contract (reference tools/i18n/i18n.py): locale JSON files named
``<lang>.json`` live in ``locale/`` next to this module; a translator object
maps a source string to its translation, falling back to the source string
itself for unknown keys, and falls back to ``en_US`` when the requested (or
auto-detected) locale has no catalog. This implementation is a from-scratch
design: a Catalog class over pathlib with an ``INDEXTTS_LANG`` env override
and support for inspecting untranslated entries.
"""

from __future__ import annotations

import json
import locale as _locale
import os
from pathlib import Path
from typing import Dict, Iterator, Optional

LOCALE_DIR = Path(__file__).resolve().parent / "locale"
FALLBACK_LANG = "en_US"
UNTRANSLATED_PREFIX = "#!"  # scan_i18n marks missing translations with this


def available_languages() -> list:
    """Languages with a catalog file on disk, sorted."""
    if not LOCALE_DIR.is_dir():
        return []
    return sorted(p.stem for p in LOCALE_DIR.glob("*.json"))


def detect_language() -> str:
    """INDEXTTS_LANG env var, else the process locale, else the fallback."""
    lang = os.environ.get("INDEXTTS_LANG")
    if not lang:
        try:
            lang = _locale.getdefaultlocale()[0]
        except Exception:
            lang = None
    return lang or FALLBACK_LANG


class Catalog:
    """One language's string table, loaded lazily from ``locale/<lang>.json``."""

    def __init__(self, lang: str):
        self.lang = lang
        self.path = LOCALE_DIR / f"{lang}.json"
        self._table: Optional[Dict[str, str]] = None

    @property
    def exists(self) -> bool:
        return self.path.is_file()

    @property
    def table(self) -> Dict[str, str]:
        if self._table is None:
            self._table = json.loads(self.path.read_text(encoding="utf-8")) if self.exists else {}
        return self._table

    def translate(self, key: str) -> str:
        value = self.table.get(key, key)
        # scan_i18n writes "#!<key>" placeholders for untranslated entries;
        # surface the original string rather than the marker
        if isinstance(value, str) and value.startswith(UNTRANSLATED_PREFIX):
            return key
        return value

    def untranslated(self) -> Iterator[str]:
        for key, value in self.table.items():
            if isinstance(value, str) and value.startswith(UNTRANSLATED_PREFIX):
                yield key


class I18nAuto:
    """Callable translator with the reference's public API: ``i18n("text")``.

    Picks the detected language when none (or "Auto") is given, falling back
    to en_US when the catalog file is absent.
    """

    def __init__(self, language: Optional[str] = None):
        if language in (None, "Auto"):
            language = detect_language()
        catalog = Catalog(language)
        if not catalog.exists:
            catalog = Catalog(FALLBACK_LANG)
        self.catalog = catalog
        self.language = catalog.lang
        # kept for API compatibility with the reference's attribute name
        self.language_map = catalog.table

    def __call__(self, key: str) -> str:
        return self.catalog.translate(key)

    def __repr__(self) -> str:
        return f"I18nAuto(language={self.language!r}, entries={len(self.catalog.table)})"


def load_language_list(language: str) -> Dict[str, str]:
    """Reference-API shim: raw catalog dict for a language."""
    return Catalog(language).table


def scan_language_list() -> list:
    """Reference-API shim: available language codes."""
    return available_languages()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="inspect locale catalogs")
    ap.add_argument("--lang", default=None, help="language code (default: auto)")
    ap.add_argument("--check", action="store_true", help="list untranslated entries")
    ns = ap.parse_args()
    i18n = I18nAuto(ns.lang)
    print(repr(i18n), "| available:", ", ".join(available_languages()) or "(none)")
    if ns.check:
        missing = list(i18n.catalog.untranslated())
        for key in missing:
            print(f"  untranslated: {key}")
        print(f"{len(missing)} untranslated entries in {i18n.language}")
