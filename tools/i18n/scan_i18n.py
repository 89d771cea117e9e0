"""Scan python sources for i18n("...") strings and sync locale JSON files
(dev tool; behavioral reference: tools/i18n/scan_i18n.py upstream)."""

import ast
import glob
import json
import os
from collections import OrderedDict

I18N_JSON_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "locale")


def extract_i18n_strings(node):
    strings = []
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id == "i18n"
        and node.args
        and isinstance(node.args[0], ast.Constant)
        and isinstance(node.args[0].value, str)
    ):
        strings.append(node.args[0].value)
    for child in ast.iter_child_nodes(node):
        strings.extend(extract_i18n_strings(child))
    return strings


def scan_files(root="."):
    strings = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        with open(path, "r", encoding="utf-8") as f:
            try:
                tree = ast.parse(f.read())
            except SyntaxError:
                continue
        strings.extend(extract_i18n_strings(tree))
    return sorted(set(strings))


def sync_locale(strings, language="en_US"):
    """Merge scanned strings into locale/<language>.json.

    en_US is self-translating (source == translation). Every OTHER language
    gets missing entries written as "#!<source>" — the UNTRANSLATED_PREFIX
    marker i18n.Catalog.untranslated()/translate() key off — so missing
    translations stay distinguishable from done ones. Stale entries (source
    string no longer in the code) are dropped AND reported."""
    path = os.path.join(I18N_JSON_DIR, f"{language}.json")
    existing = {}
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            existing = json.load(f)
    missing_value = (lambda s: s) if language == "en_US" else (lambda s: f"#!{s}")
    merged = OrderedDict((s, existing.get(s, missing_value(s))) for s in strings)
    os.makedirs(I18N_JSON_DIR, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(merged, f, ensure_ascii=False, indent=2)
        f.write("\n")
    new = [s for s in strings if s not in existing]
    stale = [s for s in existing if s not in merged]
    print(f"{language}: {len(merged)} strings ({len(new)} new, {len(stale)} stale dropped)")
    for s in stale:
        print(f"  dropped: {s!r} (was {existing[s]!r})")


if __name__ == "__main__":
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
    found = scan_files(root)
    # sync every catalog on disk (plus en_US), not only en_US — zh_CN etc.
    # otherwise never receive the untranslated markers
    langs = {"en_US"}
    for f in os.listdir(I18N_JSON_DIR) if os.path.isdir(I18N_JSON_DIR) else []:
        if f.endswith(".json"):
            langs.add(f[: -len(".json")])
    for lang in sorted(langs):
        sync_locale(found, lang)
