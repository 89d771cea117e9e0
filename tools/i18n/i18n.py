"""Locale JSON loader for UI strings (dev tool; behavioral reference:
tools/i18n/i18n.py in the upstream repo — not imported by the app)."""

import json
import locale
import os

I18N_JSON_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "locale")


def load_language_list(language):
    with open(os.path.join(I18N_JSON_DIR, f"{language}.json"), "r", encoding="utf-8") as f:
        return json.load(f)


def scan_language_list():
    return sorted(
        name.split(".")[0] for name in os.listdir(I18N_JSON_DIR) if name.endswith(".json")
    )


class I18nAuto:
    def __init__(self, language=None):
        if language in ("Auto", None):
            language = locale.getdefaultlocale()[0]
        if not language or not os.path.exists(os.path.join(I18N_JSON_DIR, f"{language}.json")):
            language = "en_US"
        self.language = language
        self.language_map = load_language_list(language)

    def __call__(self, key):
        return self.language_map.get(key, key)

    def __repr__(self):
        return "Use Language: " + self.language


if __name__ == "__main__":
    print(I18nAuto(language="en_US"))
