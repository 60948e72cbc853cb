"""Text / filename functions preserving the reference's exact semantics.

All are built from JVM-side ``pyspark.sql.functions`` (no Python crossing):
 - filename grammar + (database, collection) extraction — reference
   TextParsingUtility.kt:7-11 (accept/reject matrix TextParsingUtilityTest.kt:11-67)
 - topic derivation — HttpWriter.kt:47-49
 - output rename .txt.gz → .json.gz — HttpWriter.kt:58
 - .enc strip on decrypt — DecryptionProcessor.kt:26,40
 - snapshot-type normalization drift_testing_incremental → incremental —
   NiFiUtility.kt:27-32
 - blocked-topic denylist parse + predicate — FilterBlockedTopicsUtils.kt:15-30
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference grammar (TextParsingUtility.kt:11), named groups replaced by
# positional: group 1 = database, group 2 = collection.
FILENAME_PATTERN = r"^(?:\w+\.)?([\w-]+)\.([\w-]+)-\d{3}-\d{3}-\d+\.\w+\.\w+$"


def filename_is_valid(filename: Column) -> Column:
    return filename.rlike(FILENAME_PATTERN)


def extract_database(filename: Column) -> Column:
    return F.regexp_extract(filename, FILENAME_PATTERN, 1)


def extract_collection(filename: Column) -> Column:
    return F.regexp_extract(filename, FILENAME_PATTERN, 2)


def derive_topic(filename: Column, database: Column, collection: Column) -> Column:
    """topic = ("db." if fileName startswith "db." else "") + database + "." + collection."""
    prefix = F.when(filename.startswith("db."), F.lit("db.")).otherwise(F.lit(""))
    return F.concat(prefix, database, F.lit("."), collection)


def strip_enc_suffix(filename: Column) -> Column:
    return F.regexp_replace(filename, r"\.enc$", "")


def rename_output(filename: Column) -> Column:
    return F.regexp_replace(filename, r"\.txt\.gz$", ".json.gz")


def normalize_snapshot_type(snapshot_type: str) -> str:
    """Lowercase; anything not in {incremental, drift_testing_incremental} → full;
    drift_testing_incremental → incremental (NiFiUtility.kt:27-32)."""
    s = (snapshot_type or "").lower()
    if s not in ("incremental", "drift_testing_incremental"):
        return "full"
    return "incremental"


def parse_blocked_topics(prop: str | None) -> list[str]:
    """Comma-split denylist; single topic without comma allowed
    (FilterBlockedTopicsUtils.kt:18-22)."""
    if not prop:
        return []
    return [t.strip() for t in prop.split(",") if t.strip()]


def topic_not_blocked(topic: Column, blocked: list[str]) -> Column:
    if not blocked:
        return F.lit(True)
    return ~topic.isin(blocked)
