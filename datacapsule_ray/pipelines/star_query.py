"""The NL→SQL statistical channel over the materialized star schema
(A6, dspy_query_db.py:24-212).

Three layers, mirroring the reference's MarineSpeciesQuery end-to-end:

1. data: DuckDB views over the pipeline's parquet checkpoints plus the
   canned statistical queries (distinct families, dspy_query_db.py:64-67).
2. generation: ``NLQueryEngine`` reproduces query_database's pipeline —
   live schema introspection serialized as JSON + the location-LIKE
   usage hint (dspy_query_db.py:68-115: locations must be matched with
   LIKE '%…%', never equality), SQL generation via a pluggable backend,
   markdown-fence cleanup (dspy_query_db.py:119-121), read-only guard,
   execution, and the same result envelope (success/query/sql/
   explanation/results/column_names/row_count; error+sql on failure).
3. backends: "rules" = deterministic pattern→template generator (the
   hermetic stand-in, same role as the splitter rules backend); "http"
   = one batched /v1/completions call through clients.OpenAICompatClient
   with the schema+hint+question as the prompt (the production path,
   integration-tested against a mock endpoint).
"""

from __future__ import annotations

import json
import re

import duckdb

STAR_TABLES = ("species", "distributions", "numerical_traits", "descriptions")


def connect_star(ckpt_root: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the four star tables registered as views
    over the pipeline's parquet checkpoint directories.

    Views are built from the COMMITTED partition file list
    (``CheckpointStore.stage_files``), not a ``part-*`` glob — the glob
    would also match ``part-NNNNN.tmp`` crash leftovers, which every
    checkpoint reader deliberately excludes (checkpoint.py:141), and
    silently serve partial/duplicate rows after an interrupted rewrite."""
    from ..state.checkpoint import CheckpointStore

    store = CheckpointStore(ckpt_root)
    con = duckdb.connect()
    for t in STAR_TABLES:
        files = store.stage_files(t)
        if not files:
            raise FileNotFoundError(
                f"star table {t!r} has no committed parquet output under "
                f"{ckpt_root}/{t} — run the star stage first")
        listing = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet([{listing}])")
    return con


def query_star(ckpt_root: str, sql: str):
    """Run an arbitrary statistical query (G8) over the star schema."""
    con = connect_star(ckpt_root)
    try:
        return con.sql(sql).arrow()  # materialize while the connection lives
    finally:
        con.close()


def distinct_families(ckpt_root: str):
    """SELECT DISTINCT family (dspy_query_db.py:64-67 parity)."""
    return query_star(ckpt_root,
                      "SELECT DISTINCT family FROM species ORDER BY family")


def species_count_by_family(ckpt_root: str):
    return query_star(ckpt_root, """
        SELECT family, COUNT(*) AS n_species
        FROM species GROUP BY family ORDER BY family""")


def avg_trait_by_type(ckpt_root: str):
    return query_star(ckpt_root, """
        SELECT trait_type, trait_name, COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value, unit
        FROM numerical_traits
        GROUP BY trait_type, trait_name, unit
        ORDER BY trait_type, trait_name, unit""")


# --- NL→SQL generation (A6) -------------------------------------------------

LOCATION_HINT = (
    "重要提示：当查询涉及地理位置（distributions表的location字段）时，"
    "必须使用LIKE操作符而不是等号，例如 WHERE location LIKE '%东海%'。")

TASK_NL2SQL = "NL_TO_SQL"


def introspect_schema(con: duckdb.DuckDBPyConnection) -> str:
    """Live table-structure JSON, the shape the reference feeds its
    generator (dspy_query_db.py:68-97: table name + column name/type)."""
    out = []
    for t in STAR_TABLES:
        cols = con.sql(
            "SELECT column_name, data_type FROM information_schema.columns "
            f"WHERE table_name = '{t}' ORDER BY ordinal_position").fetchall()
        out.append({"table": t,
                    "columns": [{"name": c, "type": ty} for c, ty in cols]})
    return json.dumps(out, ensure_ascii=False, indent=2)


def clean_sql(sql: str) -> str:
    """Strip markdown code-block fences (dspy_query_db.py:119-121).
    Any language tag is removed (```sql, ```json — the natural fence
    for the generator's JSON envelope — and bare ```)."""
    return re.sub(r"```[0-9A-Za-z_]*\s*", "", sql).strip()


def _q(literal: str) -> str:
    """Escape a user-derived fragment for use inside a single-quoted SQL
    literal (doubling quotes — closes the ';-- injection route through
    the question text)."""
    return literal.replace("'", "''")


class RuleSQLGenerator:
    """Deterministic pattern→template SQL for the reference's canonical
    question shapes (counts, per-family stats, location containment with
    the mandatory LIKE, trait averages, species lookup). The hermetic
    stand-in for the LLM generator; same (sql, explanation) contract."""

    def generate(self, query: str, db_schema: str) -> tuple[str, str]:
        # strip interrogative prefixes BEFORE entity capture: the lazy
        # '(.+?)的分布' match starts at position 0, so '请问带鱼的分布'
        # would otherwise bind species = '请问带鱼' and silently return
        # zero rows inside a success envelope
        query = re.sub(r"^\s*(请问|请告诉我|我想知道|查询一下|查一下|请查询)",
                       "", query)
        m = re.search(r"分布在(.+?)的物种", query)
        if m:
            loc = _q(m.group(1))
            return (
                "SELECT DISTINCT s.chinese_name FROM species s "
                "JOIN distributions d ON s.species_id = d.species_id "
                f"WHERE d.location LIKE '%{loc}%' ORDER BY s.chinese_name",
                f"列出分布地包含“{loc}”的物种（位置用LIKE模糊匹配）")
        m = re.search(r"(.+?)的分布", query)
        if m and "物种" not in m.group(1):
            sp = _q(m.group(1))
            return (
                "SELECT d.location FROM distributions d "
                "JOIN species s ON s.species_id = d.species_id "
                f"WHERE s.chinese_name = '{sp}' ORDER BY d.location",
                f"查询物种“{sp}”的分布地")
        if re.search(r"各科|按科", query):
            return ("SELECT family, COUNT(*) AS n_species FROM species "
                    "GROUP BY family ORDER BY family",
                    "按科统计物种数量")
        if re.search(r"哪些科", query):
            return ("SELECT DISTINCT family FROM species ORDER BY family",
                    "列出所有科")
        if re.search(r"多少(个|种)物种|物种(总)?数", query):
            return ("SELECT COUNT(*) AS n_species FROM species",
                    "统计物种总数")
        m = re.search(r"平均(体长|体重|栖息水深)", query)
        if m:
            tname = m.group(1)
            return (
                "SELECT trait_name, ROUND(AVG(value), 4) AS avg_value, unit "
                "FROM numerical_traits "
                f"WHERE trait_name = '{tname}' GROUP BY trait_name, unit",
                f"计算{tname}的平均值")
        raise ValueError(f"no SQL template matches the question: {query!r}")


class HTTPSQLGenerator:
    """LLM SQL generation over an OpenAI-compatible endpoint: ONE
    completion whose prompt carries the task tag, schema JSON, the
    location-LIKE hint, and the question; the completion text must be
    JSON ``{"sql": ..., "explanation": ...}``."""

    def __init__(self, client=None, **cfg) -> None:
        from ..clients import OpenAICompatClient

        self.client = client or OpenAICompatClient(**cfg)

    def generate(self, query: str, db_schema: str) -> tuple[str, str]:
        prompt = f"{TASK_NL2SQL}\n{db_schema}\n{LOCATION_HINT}\n{query}"
        text = self.client.complete_batch([prompt])[0]
        obj = json.loads(clean_sql(text))
        return str(obj["sql"]), str(obj.get("explanation", ""))


class NLQueryEngine:
    """query_database parity (dspy_query_db.py:53-186) over the star
    parquet: introspect → generate → clean → read-only guard → execute
    → result envelope."""

    def __init__(self, ckpt_root: str, generator=None) -> None:
        self.ckpt_root = ckpt_root
        self.generator = generator or RuleSQLGenerator()

    def query_database(self, natural_language_query: str) -> dict:
        con = connect_star(self.ckpt_root)
        try:
            schema_str = introspect_schema(con)
            try:
                sql, explanation = self.generator.generate(
                    natural_language_query, schema_str)
                sql = clean_sql(sql)
                # read-only guard via the PARSER, not string inspection:
                # con.sql() executes multi-statement strings, so
                # "SELECT 1; COPY ... TO ..." would slip past a
                # first-token check. Require exactly one statement and
                # that the parser classifies it as SELECT.
                import duckdb as _duckdb

                stmts = _duckdb.extract_statements(sql) if sql.strip() else []
                if (len(stmts) != 1
                        or stmts[0].type != _duckdb.StatementType.SELECT):
                    raise ValueError(f"generated SQL is not read-only: {sql!r}")
                rel = con.sql(sql)
                column_names = list(rel.columns)
                rows = rel.fetchall()
            except Exception as e:  # noqa: BLE001 — error envelope, like the reference
                return {"success": False,
                        "query": natural_language_query,
                        "sql": locals().get("sql"),
                        "error": str(e)}
            return {
                "success": True,
                "query": natural_language_query,
                "sql": sql,
                "explanation": explanation,
                "results": [dict(zip(column_names, r)) for r in rows],
                "column_names": column_names,
                "row_count": len(rows),
            }
        finally:
            con.close()
