"""File path / URL generation (SURVEY §2.7 F10).

Mirrors the (source_type, source_field) → path-prefix routing of the
reference's SQL functions (``DB-schema.sql:300–376``). The reference
hardcodes an internal media-server base URL; here it is a required
parameter with a scheme-neutral default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (source_type, source_field) → path prefix (``DB-schema.sql:311–339``).
FILE_PATH_MAP: dict[tuple[str, str], str] = {
    ("crime", "FIR_COPY"): "/crimes/",
    ("crime", "MEDIA"): "/crimes/",
    ("person", "MEDIA"): "/person/media/",
    ("person", "IDENTITY_DETAILS"): "/person/identitydetails/",
    ("property", "MEDIA"): "/property/",
    ("interrogation", "MEDIA"): "/interrogations/media/",
    ("interrogation", "INTERROGATION_REPORT"): "/interrogations/interrogationreport/",
    ("interrogation", "DOPAMS_DATA"): "/interrogations/dopamsdata/",
    ("mo_seizures", "MO_MEDIA"): "/mo_seizures/",
    ("chargesheets", "uploadChargeSheet"): "/chargesheets/",
    ("case_property", "MEDIA"): "/fsl_case_property/",
}

DEFAULT_BASE_URL = "file:///media"


def generate_file_path(source_type: Column, source_field: Column, file_id: Column) -> Column:
    """NULL file_id or unknown (type, field) pair → NULL, like the reference."""
    m = F.create_map(
        *[F.lit(x) for (st, sf), prefix in FILE_PATH_MAP.items() for x in (f"{st}|{sf}", prefix)]
    )
    prefix = m[F.concat_ws("|", source_type, source_field)]
    return F.when(
        file_id.isNotNull() & prefix.isNotNull(), F.concat(prefix, file_id.cast("string"))
    )


def generate_file_url(
    source_type: Column, source_field: Column, file_id: Column, base_url: str = DEFAULT_BASE_URL
) -> Column:
    path = generate_file_path(source_type, source_field, file_id)
    return F.when(path.isNotNull(), F.concat(F.lit(base_url), path))
