"""One-pass HTML scan: hrefs + title + forms.

The reference parses every page three times with three separate
``html.parser.HTMLParser`` subclasses (/root/reference/libs/parsers.py:11-34,
37-201). This module runs ONE stdlib-HTMLParser pass that drives all three
state machines simultaneously — same outputs, one tokenizer pass per page
(the engine's hottest CPU path, so the 3x parse saving matters inside the
Arrow UDF batches).

Output parity (oracle-verified byte-for-byte in tests):

* hrefs: one entry per ``<a>`` start tag, the value of its href attribute or
  None when absent; duplicate attributes resolve last-wins via dict(attrs)
  (parsers.py:17-19).
* title: the ParseTitle machine (parsers.py:22-34): ANY start tag
  re-arms/disarms capture, so the captured value is the first data chunk
  immediately after the LAST ``<title>`` start tag that is directly followed
  by data; ``title_of`` strips it (parsers.py:260-264).
* forms: the FormParser machine (parsers.py:37-201) with all its quirks:
  capture is armed before any <form> and re-armed only by a <form> start
  tag; inputs with type 'submit' are skipped and unknown/missing types are
  dropped; checkbox/radio values accumulate per name; <select>/<option>/
  <textarea> are processed regardless of form scope (so elements appearing
  after </form> mutate maps already aliased into the emitted record — the
  aliasing is reproduced); textarea value is the LAST data chunk seen inside
  it, stripped; a dangling </textarea> before any <textarea> is swallowed
  (AttributeError path, parsers.py:170-177) while a dangling </select>
  propagates (parsers.py:178-183) exactly as in the reference.

html.parser is stdlib and byte-stable; we deliberately do not use lxml (the
per-row invariant is byte-identical extracted values vs the reference).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

# Input types that land in the text_fields map (parsers.py:104-109).
_TEXTUAL_INPUTS = ("text", "password", "email", "search", "tel", "url")

# Input types collected as bare name-lists, keyed by output field
# (parsers.py:112-132).
_NAMED_LIST_INPUTS = {
    "date": "dates",
    "datetime-local": "datetimes",
    "month": "months",
    "number": "numbers",
    "range": "ranges",
    "time": "times",
    "week": "weeks",
}

# The exact key order of a serialized form record (parsers.py:157-168 append
# order; dict(form) preserves it, TorSpider.py:323).
FORM_KEYS = (
    "action",
    "method",
    "target",
    "text_fields",
    "radio_buttons",
    "checkboxes",
    "dropdowns",
    "text_areas",
    "dates",
    "datetimes",
    "months",
    "numbers",
    "ranges",
    "times",
    "weeks",
)

_LIST_FIELDS = ("dates", "datetimes", "months", "numbers", "ranges", "times",
                "weeks")


class _DocScan(HTMLParser):
    """Single-pass link/title/form scanner (see module docstring).

    NOTE: ``_ta_name`` and ``_sel_name`` are intentionally NOT initialized in
    __init__ — the reference leaves them unset until the first matching start
    tag, and the AttributeError on premature close is part of its observable
    behavior (swallowed for textarea, propagated for select).
    """

    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str | None] = []
        self.title: str = ""
        self._arm_title = False
        self.forms: list[dict] = []
        self._in_textarea = False
        self._reset_form()

    def _reset_form(self) -> None:
        # Parity: reset_fields (parsers.py:185-201); found starts True.
        self._capturing = True
        self._head_pairs: list[tuple] = []
        self._sel_options: list[str | None] = []
        self._texts: dict = {}
        self._ta_value = ""
        self._radios: dict = {}
        self._checks: dict = {}
        self._drops: dict = {}
        self._tareas: dict = {}
        self._named: dict[str, list] = {k: [] for k in _LIST_FIELDS}

    # -- tokenizer callbacks -------------------------------------------------

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        # Title machine: every start tag rewrites the arm flag
        # (parsers.py:28-29).
        self._arm_title = tag == "title"
        if tag == "a":
            self.hrefs.append(a.get("href"))
        elif tag == "form":
            self._reset_form()
            self._head_pairs = [
                ("action", a.get("action")),
                ("method", a.get("method")),
                ("target", a.get("target")),
            ]
        elif tag == "textarea":
            self._ta_name = a.get("name")
            self._in_textarea = True
            self._ta_value = ""
        elif tag == "select":
            self._sel_name = a.get("name")
            self._sel_options = []
        elif tag == "option":
            self._sel_options.append(a.get("value"))
        elif tag == "input":
            self._take_input(a)

    def _take_input(self, a: dict) -> None:
        kind = a.get("type")
        if not self._capturing or kind == "submit":
            return
        name = a.get("name")
        value = a.get("value")
        if kind in _TEXTUAL_INPUTS:
            self._texts[name] = value
        elif kind in _NAMED_LIST_INPUTS:
            self._named[_NAMED_LIST_INPUTS[kind]].append(name)
        elif kind == "checkbox":
            self._checks.setdefault(name, []).append(value)
        elif kind == "radio":
            self._radios.setdefault(name, []).append(value)
        # unknown / missing type: dropped (no matching branch in
        # parsers.py:103-146)

    def handle_data(self, data):
        if self._arm_title:
            self.title = data
            self._arm_title = False
        if self._in_textarea:
            self._ta_value = data.strip()

    def handle_endtag(self, tag):
        if tag == "form":
            self._capturing = False
            record = dict(self._head_pairs)
            # Field maps are aliased, not copied — later out-of-form
            # <select>/<textarea> closes mutate the emitted record, exactly
            # like the reference (see module docstring).
            record["text_fields"] = self._texts
            record["radio_buttons"] = self._radios
            record["checkboxes"] = self._checks
            record["dropdowns"] = self._drops
            record["text_areas"] = self._tareas
            for key in _LIST_FIELDS:
                record[key] = self._named[key]
            self.forms.append(record)
        elif tag == "textarea":
            self._in_textarea = False
            try:
                self._tareas[self._ta_name] = self._ta_value
            except Exception:
                pass
            self._ta_name = ""
        elif tag == "select":
            self._drops[self._sel_name] = self._sel_options
            self._sel_name = ""
            self._sel_options = []


def scan_page(text: str) -> tuple[list[str | None], str, list[dict]]:
    """One tokenizer pass -> (raw hrefs, stripped title, form records)."""
    scanner = _DocScan()
    scanner.feed(text)
    return scanner.hrefs, scanner.title.strip(), scanner.forms


def title_of(text: str) -> str:
    """Page title (parity: parsers.py:260-264, incl. ``.strip()``)."""
    scanner = _DocScan()
    scanner.feed(text)
    return scanner.title.strip()


def hrefs_of(text: str) -> list[str | None]:
    """Raw ``<a href>`` values in document order (parity: parsers.py:11-19)."""
    scanner = _DocScan()
    scanner.feed(text)
    return scanner.hrefs


def forms_of(text: str) -> list[dict]:
    """Form records as dicts in reference key order (parsers.py:207-211 +
    the ``dict(form)`` conversion at TorSpider.py:321-325)."""
    scanner = _DocScan()
    scanner.feed(text)
    return scanner.forms


def forms_of_json(text: str) -> list[str]:
    """Form records serialized exactly as the reference embeds them in its
    scan-result JSON (json.dumps of each dict; None map-keys become the JSON
    key "null" just as in the reference's serialization)."""
    return [json.dumps(f) for f in forms_of(text)]
