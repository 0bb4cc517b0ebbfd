"""RIS reader/writer (reference trialstreamer/ris.py:10-128).

Reading: RIS is a stateful line format (tag-continuation, per-dialect
record delimiters for PubMed / Ovid-EndNote / Ovid-RIS / Wiley), so the
reader is a per-file record assembler. In Spark that is
``spark.read.text(wholetext)`` + ``mapInPandas`` — one task per file,
which matches the format's inherently sequential structure; parallelism
comes from file count (same argument as the gz XML source).

Writing: the export path caps at 250 rows (reference cnxapp.py:217), so
serialization happens on collected rows driver-side, mirroring
ris.dumps (ris.py:112-128).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_TAG_RE = re.compile(r"^([A-Z][A-Z0-9]{0,3})\s*-\s?(.*)$")
_DELIM_OVID_EN = re.compile(r"^<[1-9][0-9]*\. >")
_DELIM_OVID_RIS = re.compile(r"^[1-9][0-9]*\.")
_WILEY_IGNORES = (
    re.compile(r"^Record #[1-9][0-9]* of [1-9][0-9]*$"),
    re.compile(r"^Provider: John Wiley & Sons, Ltd\.$"),
    re.compile(r'^Content: text/plain; charset="UTF-8"$'),
)

RECORD_SCHEMA = "source_file string, record_idx int, tag string, values array<string>"


def parse_ris_text(text: str) -> list[dict]:
    """One RIS file → list of {tag: [values]} records. Dialect inferred
    from the first line (ris.py:46-60); continuation lines append to the
    previous tag's last value."""
    records: list[dict] = []
    entry: dict[str, list[str]] = {}
    last_tag: str | None = None

    def flush():
        nonlocal entry, last_tag
        if entry:
            records.append(entry)
        entry, last_tag = {}, None

    lines = text.splitlines()
    first = lines[0] if lines else ""
    if _DELIM_OVID_EN.match(first):
        is_delim = _DELIM_OVID_EN.match
    elif _DELIM_OVID_RIS.match(first):
        is_delim = _DELIM_OVID_RIS.match
    else:
        is_delim = re.compile(r"^\s*$").match  # pubmed: blank-line delim

    for line in lines:
        line = line.lstrip("﻿")
        if any(w.match(line) for w in _WILEY_IGNORES):
            continue
        if is_delim(line):
            flush()
            continue
        if tag_is_end(line):
            flush()
            continue
        m = _TAG_RE.match(line)
        if m:
            tag, val = m.group(1), m.group(2).strip()
            entry.setdefault(tag, []).append(val)
            last_tag = tag
        elif last_tag and line.strip():
            entry[last_tag][-1] += " " + line.strip()
    flush()
    return records


def tag_is_end(line: str) -> bool:
    return line.startswith("ER ") or line.strip() == "ER  -" or line.strip() == "ER-"


def read_ris(spark: SparkSession, glob_path: str) -> DataFrame:
    """RIS files → long-format rows (source_file, record_idx, tag,
    values). MapType isn't join-friendly, so the long format is the
    lakehouse representation; pivot on demand."""

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for idx, rec in enumerate(parse_ris_text(r["value"])):
                    for tag, values in rec.items():
                        rows.append(
                            {
                                "source_file": r["path"],
                                "record_idx": idx,
                                "tag": tag,
                                "values": values,
                            }
                        )
            yield pd.DataFrame(rows) if rows else pd.DataFrame()

    files = spark.read.text(glob_path, wholetext=True).withColumn(
        "path", _input_file()
    )
    return files.mapInPandas(assemble, schema=RECORD_SCHEMA)


def _input_file():
    from pyspark.sql import functions as F

    return F.input_file_name()


def dumps(records: list[dict]) -> str:
    """Serialize records (dict of tag → value or list) to RIS text
    (ris.py:112-128): one 'TAG  - value' line per value, ER terminator."""
    out = []
    for rec in records:
        for tag, vals in rec.items():
            if not isinstance(vals, (list, tuple)):
                vals = [vals]
            for v in vals:
                if v is not None:
                    out.append(f"{tag}  - {v}")
        out.append("ER  - ")
        out.append("")
    return "\n".join(out)
