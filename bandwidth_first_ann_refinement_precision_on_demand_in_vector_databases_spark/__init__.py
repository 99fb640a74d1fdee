"""Bandwidth-First ANN Refinement — PySpark-native engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the reference artifact
``teresazhang05/Bandwidth-First-ANN-Refinement-Precision-on-Demand-in-Vector-Databases``
(single-file NumPy implementation, ``ANNCode.py``).

The engine models a vector corpus as a DataFrame
``(vec_id BIGINT, embedding ARRAY<FLOAT>)`` and provides:

* bit-accurate FP16 precision-reduction transforms (pandas UDFs),
* exact and two-phase ("precision-on-demand") top-K similarity search
  with six early-rejection cushions (pure DataFrame plans),
* bandwidth / recall / false-positive-rate accounting,
* relational operators (joins, aggregations, windows, set ops),
* LLM-data-pipeline extensions: dedup, ANN, text analysis,
* a Structured Streaming surface.

Design rule: everything that can be a Column expression is a Column
expression (Catalyst-optimizable, whole-stage codegen); Python touches
data only through Arrow-batched pandas UDFs, and only where bit-exact
FP16 semantics or per-query sequential state genuinely require it.
"""

__version__ = "0.1.0"

from .session import clear_caches, get_spark, session_cache  # noqa: F401
