"""CSV import/export with a declared YAML schema — the btrfiles analog.

The reference converts CSV to its binary column format via a YAML schema
(``/root/reference/btrfiles/btrfiles.hpp:13-48``, ``Parser.cpp:21-195``)
with types {integer, double, string, skip} and renders nulls on export
(``tools/conversion/btrtocsv.cpp``). Here both directions are one-liner
Spark jobs: ``spark.read.csv`` with an explicit StructType (never
inference — the reference's schema is declared, SURVEY.md §1.1) and
``df.write.csv`` with a null literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TYPES = {
    "integer": IntegerType(),
    "bigint": LongType(),
    "double": DoubleType(),
    "string": StringType(),
}


def schema_from_yaml(yaml_text: str) -> tuple[StructType, list[str]]:
    """Parse the reference's schema YAML: {columns: [{name, type}, ...]}.

    Returns (schema including skipped cols as string, skip-column names) —
    skipped columns are read then dropped, like the reference's SKIP type.
    """
    import yaml

    doc = yaml.safe_load(yaml_text)
    fields, skips = [], []
    for col in doc["columns"]:
        name, typ = col["name"], col["type"].lower()
        if typ == "skip":
            fields.append(StructField(name, StringType()))
            skips.append(name)
        else:
            fields.append(StructField(name, _TYPES[typ]))
    return StructType(fields), skips


def read_csv(
    spark: SparkSession,
    path: str,
    schema_yaml: str,
    delimiter: str = "|",
    null_value: str = "null",
) -> DataFrame:
    schema, skips = schema_from_yaml(schema_yaml)
    df = (
        spark.read.option("delimiter", delimiter)
        .option("nullValue", null_value)
        .option("header", "false")
        .schema(schema)
        .csv(path)
    )
    return df.drop(*skips) if skips else df


def write_csv(
    df: DataFrame,
    path: str,
    delimiter: str = "|",
    null_value: str = "null",
) -> None:
    (
        df.write.option("delimiter", delimiter)
        .option("nullValue", null_value)
        .option("header", "false")
        .mode("overwrite")
        .csv(path)
    )
