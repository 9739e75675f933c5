"""chrono_ts_spark — a PySpark-native time-series analytics engine.

Re-expresses the capability surface of the Chrono-TS reference (a
time-series database; see SURVEY.md — reference repo was unavailable,
so the operator inventory derives from the driver contract + the public
TSDB capability class) as idiomatic Spark DataFrame / SQL plans, plus
the LLM-data-pipeline extension operators (dedup, similarity search,
text analysis, multimodal plumbing) required at 100 TB scale.

Design principles (SURVEY.md §4):
- Declarative DataFrame plans; let Catalyst do pushdown/pruning/join
  selection; zero custom Catalyst rules.
- Built-in `pyspark.sql.functions` in every hot path; Pandas UDFs only
  where semantics genuinely require Python (multimodal decode stubs).
- Signature TSDB ops (as-of join, gap-fill, rate) as logical-plan
  patterns over windows/sequence/explode — shuffle-minimal and
  scale-oblivious.
"""

__version__ = "0.1.0"
