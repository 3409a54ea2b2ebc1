"""Go reference-time layout → Java DateTimeFormatter pattern translation.

The reference's Date filter accepts Go layouts plus the special tokens
RFC3339 / ISO8601 / UNIX / UNIX_MS (/root/reference/filter/date.go:30-152).
Spark's to_timestamp takes Java patterns, so translation happens once at
compile time — keeping parsing JVM-side (whole-stage codegen) instead of a
per-row Python date parser.
"""

from __future__ import annotations

# Longest-first ordered mapping of Go layout tokens → Java pattern tokens.
_TOKENS: list[tuple[str, str]] = [
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    ("January", "MMMM"),
    ("Monday", "EEEE"),
    ("2006", "yyyy"),
    ("Jan", "MMM"),
    ("Mon", "EEE"),
    ("MST", "zz"),
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("-07:00", "XXX"),
    ("-0700", "XX"),
    ("-07", "X"),
    ("15", "HH"),
    ("01", "MM"),
    ("02", "dd"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    ("PM", "a"),
    ("pm", "a"),
    ("_2", "d"),
    ("1", "M"),
    ("2", "d"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
]

SPECIAL = {"UNIX", "UNIX_MS", "RFC3339", "ISO8601"}


def go_layout_to_java(layout: str) -> str:
    """Translate one Go reference-time layout into a Java pattern."""
    if layout in SPECIAL:
        raise ValueError(f"special token {layout} has no Java pattern")
    parts: list[tuple[bool, str]] = []  # (is_pattern, text)
    i = 0
    while i < len(layout):
        for go, java in _TOKENS:
            if layout.startswith(go, i):
                parts.append((True, java))
                i += len(go)
                break
        else:
            parts.append((False, layout[i]))
            i += 1
    # render: quote runs of literal characters that contain letters
    out: list[str] = []
    run: list[str] = []

    def flush():
        if not run:
            return
        text = "".join(run)
        if any(c.isalpha() for c in text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)
        run.clear()

    for is_pat, text in parts:
        if is_pat:
            flush()
            out.append(text)
        else:
            run.append(text)
    flush()
    return "".join(out)
