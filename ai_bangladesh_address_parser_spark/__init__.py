"""PySpark-native record-linkage / address-analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``Md-Tarikul-Islam-Juel/ai-bangladesh-address-parser``
(see SURVEY.md): address mention extraction + normalization,
component parsing (regex + gazetteer broadcast joins), evidence-weighted
conflict resolution, blocking, pairwise scoring, and transitive
clustering via large-star/small-star connected components — plus the
training-data-pipeline operators a 100 TB corpus needs (dedup families,
similarity search, text quality analysis, multimodal column plumbing).

Design rules (enforced throughout):
  * DataFrame/SQL first; Catalyst expressions over Python.
  * UDFs only as vectorized Arrow ``pandas_udf`` / ``mapInPandas``.
  * Small dimension tables are broadcast; big self-joins are blocked,
    salted, and AQE-skew-hardened.
  * Deterministic everywhere: fixed hash seeds, total-order tie-breaks.
"""

__version__ = "0.1.0"
