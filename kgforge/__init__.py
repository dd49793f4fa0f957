"""kgforge — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of jataware/semantic-search (reference at
/root/reference, read-only) as an idiomatic Spark DataFrame pipeline:

    files (repo, path, commit, lang, content)
      -> mentions   (lexical extraction, mapInPandas)        stages/mentions.py
      -> embeddings (hashed n-gram mean-pool, pandas_udf)    stages/embed.py
      -> links      (sign-LSH blocking + cosine self-join)   stages/link.py
      -> entities   (large-star/small-star components)       stages/canonical.py
      -> triples    (subj, pred, obj, line, score)            stages/materialize.py
                    (line = normalized first-occurrence evidence; the
                     '<subj>:<line>' display string is materialize.with_evidence)

plus a general operator library (operators/) covering the reference's full
operator inventory (SURVEY.md §2): tf-idf search, top-k windows, canonical
pairs, set-op metrics, dedup (exact/minhash/simhash/jaccard/embedding),
similarity search (brute-force + LSH/IVF), and text analytics.

Nothing here is a port: the reference's dict/tensor machinery is replaced by
declarative DataFrame plans that Catalyst/AQE optimize (predicate pushdown,
broadcast joins, AQE skew splitting); Python only runs inside Arrow-batched
pandas UDFs.
"""

__version__ = "0.1.0"
