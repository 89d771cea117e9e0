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
    path = os.path.join(I18N_JSON_DIR, f"{language}.json")
    existing = {}
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            existing = json.load(f)
    merged = OrderedDict((s, existing.get(s, s)) for s in strings)
    os.makedirs(I18N_JSON_DIR, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(merged, f, ensure_ascii=False, indent=2)
    print(f"{language}: {len(merged)} strings ({len(merged) - len(existing)} new)")


if __name__ == "__main__":
    sync_locale(scan_files(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")))
