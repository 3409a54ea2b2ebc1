"""Grok filter — first-match-wins list of named-group regexes.

Mirrors /root/reference/filter/grok.go:238-281 (apply), :103-137 (recursive
``%{NAME:field}`` pattern expansion), :148-160 (match). Options:
``ignore_blank`` (skip empty captures), ``overwrite``, ``target``.

Spark realization: each grok pattern expands (at compile time) to one Java
regex; per output field the value is a first-match-wins chain
``when(src rlike p1, regexp_extract(src, p1, idx1)).when(src rlike p2, ...)``.
Catalyst subexpression elimination shares the rlike evaluations; everything
stays in whole-stage codegen — no Python regex in the hot path.

The built-in pattern set is the standard public grok core (logstash-patterns
subset), re-declared here.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gohangout_spark.expr.paths import field_col
from gohangout_spark.operators.base import Filter, FilterEffect

BUILTIN_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?<![0-9.+-])(?>[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+)))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?<![0-9A-Fa-f])(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?>(?<!\\)(?>\"(?>\\.|[^\\\"]+)+\"|\"\"|(?>'(?>\\.|[^\\']+)+')|''|(?>`(?>\\.|[^\\`]+)+`)|``))",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?<![0-9])(?:(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5]))(?![0-9])",
    "IP": r"(?:%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(\.?|\b)",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "YEAR": r"(?>\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "LOGLEVEL": r"([Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
}

def load_pattern_file(path: str) -> dict[str, str]:
    """Pattern files: one 'NAME regex' per line (grok.go pattern_paths);
    directories load every file inside."""
    import os

    out: dict[str, str] = {}
    paths = (
        [os.path.join(path, f) for f in sorted(os.listdir(path))]
        if os.path.isdir(path)
        else [path]
    )
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                name, _, pattern = line.partition(" ")
                if name and pattern:
                    out[name] = pattern.strip()
    return out


_GROK_REF = re.compile(r"%\{(\w+)(?::([\w\[\]\.@-]+))?\}")
_NAMED_GROUP = re.compile(r"\(\?P?<([^>]+)>")


def expand_grok(pattern: str, library: dict[str, str], _depth: int = 0) -> str:
    """Recursively expand %{NAME:field} / %{NAME} (grok.go:103-137)."""
    if _depth > 20:
        raise ValueError(f"grok pattern recursion too deep: {pattern!r}")

    def sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        if name not in library:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        inner = expand_grok(library[name], library, _depth + 1)
        if field:
            return f"(?<{field}>{inner})"
        return f"(?:{inner})"

    return _GROK_REF.sub(sub, pattern)


def _go_to_java_groups(pattern: str) -> str:
    """Go named groups (?P<x>...) → Java (?<x>...)."""
    return pattern.replace("(?P<", "(?<")


def _javaify_groups(pattern: str) -> tuple[str, dict[str, str]]:
    """Rename every named group to a unique Java-legal name ``gN``.

    Java named groups only allow ``[A-Za-z][A-Za-z0-9]*`` — the reference's
    RE2 accepts underscores/dots, and real logstash fields are full of them
    (``ts_raw``, ``response.time``). Extraction is by INDEX anyway
    (group_index_map), so the in-pattern name is free to be synthetic;
    returns the rewritten pattern plus {gN: original field name} so event
    fields keep their exact reference spelling."""
    mapping: dict[str, str] = {}
    out: list[str] = []
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            # escaped char (incl. \( ) — copy verbatim, never a group start
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            out.append(c)
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            continue
        m = re.match(r"\(\?P?<([^>=!][^>]*)>", pattern[i:])
        if m:
            safe = f"g{len(mapping)}"
            mapping[safe] = m.group(1)
            out.append(f"(?<{safe}>")
            i += m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out), mapping


def group_index_map(pattern: str) -> dict[str, int]:
    """Map named-group name → 1-based capture index, by counting
    unescaped capturing '(' left to right."""
    names: dict[str, int] = {}
    idx = 0
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            if pattern.startswith("(?", i):
                m = re.match(r"\(\?P?<([^>=!]+)>", pattern[i:])
                if m:
                    idx += 1
                    names[m.group(1)] = idx
                # (?: (?= (?! (?> etc. are non-capturing
            else:
                idx += 1
        i += 1
    return names


class Grok(Filter):
    def __init__(
        self,
        src: str = "message",
        match: list[str] | None = None,
        ignore_blank: bool = True,
        overwrite: bool = True,
        target: str | None = None,
        pattern_library: dict[str, str] | None = None,
        pattern_paths: list[str] | None = None,
    ):
        self.src = src
        lib = dict(BUILTIN_PATTERNS)
        for path in pattern_paths or []:
            lib.update(load_pattern_file(path))
        if pattern_library:
            lib.update(pattern_library)
        self.patterns: list[tuple[str, dict[str, int]]] = []
        for p in match or []:
            expanded, nmap = _javaify_groups(_go_to_java_groups(expand_grok(p, lib)))
            idx = group_index_map(expanded)
            groups: dict[str, int] = {}
            for g, i in idx.items():
                field = nmap.get(g, g)
                if field in groups:
                    # Go's regexp rejects duplicate group names too — fail
                    # at compile, not with silently-null extractions
                    raise ValueError(
                        f"grok pattern captures field {field!r} twice: {p!r}"
                    )
                groups[field] = i
            self.patterns.append((expanded, groups))
        self.ignore_blank = ignore_blank
        self.overwrite = overwrite
        self.target = target

    def build(self, df: DataFrame) -> FilterEffect:
        col = field_col(self.src, df).cast("string")
        eff = FilterEffect()

        matches = [col.rlike(p) for p, _ in self.patterns]
        all_fields: list[str] = []
        for _, groups in self.patterns:
            for g in groups:
                if g not in all_fields:
                    all_fields.append(g)

        for fname in all_fields:
            # first-match-wins across the pattern list (grok.go Filter loop
            # returns after the FIRST matching pattern): a row matched by an
            # earlier pattern must NOT take this field from a later pattern,
            # so patterns lacking the field contribute an explicit NULL branch
            value: Column | None = None
            for (p, groups), matched in zip(self.patterns, matches):
                if fname in groups:
                    extracted = F.regexp_extract(col, p, groups[fname])
                    if self.ignore_blank:
                        # bind the extract once: when(e != '', e) evaluates
                        # the regexp_extract twice per matching row (the
                        # blank-check sits in a conditional branch, which
                        # codegen subexpression elimination skips); the
                        # transform(array(e), …)[0] lambda variable is a
                        # materialized value, so check and result read ONE
                        # extraction (same trick as dedup.zipped_shingles)
                        extracted = F.transform(
                            F.array(extracted), lambda x: F.when(x != "", x)
                        )[0]
                else:
                    extracted = F.lit(None)
                branch = F.when(matched, extracted)
                value = branch if value is None else value.when(matched, extracted)
            path = f"[{self.target}][{fname}]" if self.target else fname
            if not self.overwrite:
                value = F.coalesce(field_col(path, df), value)
            eff.assignments[path] = value

        succ = matches[0] if matches else F.lit(False)
        for m in matches[1:]:
            succ = succ | m
        eff.success = F.coalesce(succ, F.lit(False))
        return eff
