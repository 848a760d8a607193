"""Engine: the SQL/DataFrame entry point over a warehouse of versioned
datasets — the thin layer the reference implements as its server + catalog +
runner stack (cmd/main/main.go:63-98 plandb, pkg/storage/catalog.go:16,
pkg/compute InitRunner).

Everything heavy is delegated: parsing/binding/optimization/execution is
Catalyst (`spark.sql`), storage is the versioned dataset layer
(plan_spark.dataset). The engine owns only:

- the catalog: schema -> table -> Dataset root directory (JSON, like the
  reference's catalog entries but with Spark as the executor)
- DDL: create_schema / create_table (+ drop) — builder_ddl.go:30-92
- DML: insert values, COPY FROM parquet/csv — builder_dml.go:14-470
- query entry: sql() registers every table as a temp view and delegates
- EXPLAIN surface — explain.go:118,238
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from plan_spark.dataset import Dataset


class Engine:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)
        self._catalog_path = os.path.join(self.warehouse, "_catalog.json")
        self._catalog = self._load_catalog()

    # ------------------------------------------------------------- catalog
    def _load_catalog(self) -> dict:
        if os.path.exists(self._catalog_path):
            with open(self._catalog_path) as fh:
                return json.load(fh)
        return {"schemas": {"main": {"tables": {}}}}

    def _save_catalog(self) -> None:
        with open(self._catalog_path, "w") as fh:
            json.dump(self._catalog, fh, indent=1, sort_keys=True)

    def create_schema(self, name: str) -> None:
        """CREATE SCHEMA (reference builder_ddl.go:30)."""
        self._catalog["schemas"].setdefault(name, {"tables": {}})
        self._save_catalog()

    def schemas(self) -> list[str]:
        return sorted(self._catalog["schemas"])

    def tables(self, schema: str = "main") -> list[str]:
        return sorted(self._catalog["schemas"][schema]["tables"])

    def _entry(self, table: str, schema: str) -> dict:
        try:
            return self._catalog["schemas"][schema]["tables"][table]
        except KeyError:
            raise KeyError(f"table {schema}.{table} not found") from None

    # ----------------------------------------------------------------- DDL
    def create_table(
        self,
        name: str,
        schema_ddl: str,
        schema: str = "main",
        primary_key: list[str] | None = None,
    ) -> Dataset:
        """CREATE TABLE (reference builder_ddl.go:92). ``schema_ddl`` is a
        Spark DDL string ("a INT, b STRING"). PRIMARY KEY is recorded as
        metadata only — unenforced, same stance as Spark/the lakehouse model
        (the reference enforces it via its MVCC index; at 100 TB enforced
        uniqueness requires a shuffle per insert, so it is opt-in metadata)."""
        if name in self._catalog["schemas"][schema]["tables"]:
            raise ValueError(f"table {schema}.{name} already exists")
        root = os.path.join(self.warehouse, schema, name)
        struct = StructType.fromDDL(schema_ddl)
        empty = self.spark.createDataFrame([], struct)
        ds = Dataset.create(self.spark, root, empty)
        self._catalog["schemas"][schema]["tables"][name] = {
            "root": root,
            "primary_key": primary_key or [],
        }
        self._save_catalog()
        return ds

    def drop_table(self, name: str, schema: str = "main") -> None:
        import shutil

        entry = self._entry(name, schema)
        shutil.rmtree(entry["root"], ignore_errors=True)
        del self._catalog["schemas"][schema]["tables"][name]
        self._save_catalog()

    def dataset(self, name: str, schema: str = "main") -> Dataset:
        return Dataset.open(self.spark, self._entry(name, schema)["root"])

    # ----------------------------------------------------------------- DML
    def insert_values(self, name: str, rows: list[tuple], schema: str = "main") -> None:
        """INSERT ... VALUES (reference builder_dml.go:14-208): rows are
        cast to the table schema exactly like the reference's
        CastLogicalOperatorToTypes (builder_dml.go:278)."""
        ds = self.dataset(name, schema)
        df = self.spark.createDataFrame(rows, ds.schema)
        ds.append(df)

    def insert_df(self, name: str, df: DataFrame, schema: str = "main") -> None:
        ds = self.dataset(name, schema)
        cast = df.select(
            *[df[f.name].cast(f.dataType) for f in ds.schema.fields]
        )
        ds.append(cast)

    def copy_from(
        self,
        name: str,
        path: str,
        fmt: str = "parquet",
        schema: str = "main",
        **options,
    ) -> None:
        """COPY table FROM 'file' WITH (FORMAT ...) — reference
        builder_dml.go:325-470 / executor_scan.go:272-344. The load is a
        distributed read + append commit; CSV requires the table schema
        (no inference — reference reads typed fields, executor_scan.go:364)."""
        ds = self.dataset(name, schema)
        if fmt == "parquet":
            df = self.spark.read.parquet(path)
        elif fmt == "csv":
            df = self.spark.read.options(**({"header": "true"} | options)).schema(
                ds.schema
            ).csv(path)
        else:
            raise ValueError(f"unsupported COPY format {fmt}")
        self.insert_df(name, df, schema)

    # --------------------------------------------------------------- query
    def _register_views(self) -> None:
        for sname, s in self._catalog["schemas"].items():
            for tname, entry in s["tables"].items():
                df = Dataset.open(self.spark, entry["root"]).to_df()
                df.createOrReplaceTempView(tname)
                df.createOrReplaceTempView(f"{sname}_{tname}")

    def sql(self, text: str) -> DataFrame | None:
        """SQL entry point mirroring the reference's server loop
        (cmd/main/main.go:73-98): one front door for queries AND statements.

        Queries: every catalog table is registered as a view and the text is
        delegated to Catalyst (the reference's parse/bind/optimize/execute,
        SURVEY.md §3.1 steps 3-9, collapsed into one call).

        Statements (reference builder_ddl.go / builder_dml.go): CREATE
        SCHEMA/TABLE, DROP TABLE, INSERT ... VALUES, COPY ... FROM,
        DELETE FROM ... WHERE, UPDATE ... SET ... WHERE are routed to the
        catalog/dataset layer. Statement literals and predicates are still
        parsed by Spark (VALUES via a SELECT rewrite, predicates via
        F.expr) — the engine never grows its own expression parser."""
        import re

        s = text.strip().rstrip(";").strip()
        m = re.match(r"(?is)^CREATE\s+SCHEMA\s+(\w+)$", s)
        if m:
            self.create_schema(m.group(1))
            return None
        m = re.match(r"(?is)^CREATE\s+TABLE\s+(\w+)\s*\((.*)\)$", s)
        if m:
            name, body = m.group(1), m.group(2)
            cols, pk = [], []
            for part in re.split(r",(?![^()]*\))", body):
                part = part.strip()
                pm = re.match(r"(?is)^PRIMARY\s+KEY\s*\((.*)\)$", part)
                if pm:
                    pk = [c.strip() for c in pm.group(1).split(",")]
                    continue
                cm = re.match(r"(?is)^(\w+)\s+(.+?)(\s+PRIMARY\s+KEY|\s+NOT\s+NULL)*$", part)
                colname, coltype = cm.group(1), cm.group(2)
                if re.search(r"(?i)PRIMARY\s+KEY", part):
                    pk.append(colname)
                cols.append(f"{colname} {coltype}")
            self.create_table(name, ", ".join(cols), primary_key=pk or None)
            return None
        m = re.match(r"(?is)^DROP\s+TABLE\s+(\w+)$", s)
        if m:
            self.drop_table(m.group(1))
            return None
        m = re.match(r"(?is)^INSERT\s+INTO\s+(\w+)\s+VALUES\s+(.*)$", s)
        if m:
            name, vals = m.group(1), m.group(2)
            rows_df = self.spark.sql(f"SELECT * FROM VALUES {vals}")
            # VALUES yields col1..colN — bind positionally to the table schema
            rows_df = rows_df.toDF(*self.dataset(name).schema.fieldNames())
            self.insert_df(name, rows_df)
            return None
        m = re.match(
            r"(?is)^COPY\s+(\w+)\s+FROM\s+'([^']+)'(?:\s+WITH\s*\((.*)\))?$", s
        )
        if m:
            name, path, opts = m.group(1), m.group(2), m.group(3) or ""
            fmt = "parquet"
            options = {}
            fm = re.search(r"(?i)FORMAT\s+'?(\w+)'?", opts)
            if fm:
                fmt = fm.group(1).lower()
            dm = re.search(r"(?i)DELIMITER\s+'([^']+)'", opts)
            if dm:
                options["sep"] = dm.group(1)
            self.copy_from(name, path, fmt=fmt, **options)
            return None
        m = re.match(r"(?is)^DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.*)$", s)
        if m:
            self.dataset(m.group(1)).delete(m.group(2))
            return None
        m = re.match(r"(?is)^UPDATE\s+(\w+)\s+SET\s+(.*?)\s+WHERE\s+(.*)$", s)
        if m:
            name, sets, pred = m.group(1), m.group(2), m.group(3)
            assignments = {}
            for a in re.split(r",(?![^()]*\))", sets):
                col, expr = a.split("=", 1)
                assignments[col.strip()] = expr.strip()
            self.dataset(name).update(assignments, pred)
            return None
        self._register_views()
        return self.spark.sql(text)

    def explain(self, text: str, mode: str = "formatted") -> str:
        """EXPLAIN surface (reference explain.go:118): returns the formatted
        plan — scans show PushedFilters/ReadSchema so pushdown is auditable."""
        df = self.sql(text)
        if df is None:
            raise ValueError("EXPLAIN applies to queries, not DDL/DML statements")
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )
