"""Stage A — pages -> (text, entities), the graft's extraction stage.

Replaces the reference's OSM-file readers (/root/reference/src/
waterinspector.cpp:113, :123, :140) with a single Arrow-batched
``mapInPandas`` pass over the ``pages`` table: HTML -> visible text
(byte-identical per url vs the generator's ground truth, the
BASELINE.json per-row invariant) + the embedded geo payload -> typed
entity rows.

Text extraction is vectorized pandas ``.str`` ops over the whole Arrow
batch (regex tag stripping); only the JSON payload decode is per-document
Python inside the batch (one payload per page, not per output row). The
derived nodes/ways/relations DataFrames then replace the reference's
entity-kind scan pruning with Catalyst column/partition pruning
(SURVEY.md §4 row 1).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmi_water_spark.schemas import RELATION_MEMBER

_SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
_BLOCK_CLOSE_RE = r"</(?:title|h1|h2|h3|p|div|li)>"
_TAG_RE = r"<[^>]*>"
_PAYLOAD_RE = r'(?s)<script type="application/osm\+json">(.*?)</script>'

EXTRACT_SCHEMA = (
    "url string, text string, kind string, id long, lon double, lat double, "
    "node_ids array<long>, members string, tags string, ts long"
)


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized HTML -> visible text. The extraction contract: script
    blocks removed, block-level closers become newlines, all other markup
    stripped, trailing newlines trimmed."""
    s = html.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    s = s.str.replace(_SCRIPT_RE, "", regex=True)
    s = s.str.replace(_BLOCK_CLOSE_RE, "\n", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    return s.str.rstrip("\n")


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        html = pdf["html"]
        text = extract_text_series(html)
        payloads = html.map(
            lambda b: (b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
        ).str.extract(_PAYLOAD_RE, expand=False)

        out = {
            "url": [], "text": [], "kind": [], "id": [], "lon": [], "lat": [],
            "node_ids": [], "members": [], "tags": [], "ts": [],
        }
        for url, txt, raw in zip(pdf["url"], text, payloads):
            ent = json.loads(raw) if isinstance(raw, str) and raw else None
            out["url"].append(url)
            out["text"].append(txt)
            if ent is None:
                out["kind"].append(None)
                out["id"].append(None)
                out["lon"].append(None)
                out["lat"].append(None)
                out["node_ids"].append(None)
                out["members"].append(None)
                out["tags"].append(None)
                out["ts"].append(None)
                continue
            out["kind"].append(ent["kind"])
            out["id"].append(ent["id"])
            out["lon"].append(ent.get("lon"))
            out["lat"].append(ent.get("lat"))
            out["node_ids"].append(ent.get("node_ids"))
            out["members"].append(
                json.dumps(ent["members"]) if "members" in ent else None
            )
            out["tags"].append(json.dumps(ent.get("tags", {})))
            out["ts"].append(ent.get("ts"))
        yield pd.DataFrame(out)


def extract_entities(pages: DataFrame) -> DataFrame:
    """pages -> flat extraction DataFrame (one row per page)."""
    return pages.select("url", "html").mapInPandas(_extract_batches, EXTRACT_SCHEMA)


def split_entities(extracted: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Extraction rows -> (nodes, ways, relations) typed DataFrames
    (FIXTURES.md §2 schemas)."""
    tags = F.from_json("tags", "map<string,string>").alias("tags")
    nodes = extracted.filter(F.col("kind") == "node").select("id", "lon", "lat", tags)
    ways = extracted.filter(F.col("kind") == "way").select(
        "id", "node_ids", tags, F.timestamp_seconds("ts").alias("ts")
    )
    relations = extracted.filter(F.col("kind") == "relation").select(
        "id",
        F.from_json("members", f"array<struct<type:string,ref:long,role:string>>").alias(
            "members"
        ),
        tags,
        F.timestamp_seconds("ts").alias("ts"),
    )
    assert relations.schema["members"].dataType.elementType == RELATION_MEMBER
    return nodes, ways, relations
