"""The Spark layer: session helpers, the extraction job, evaluation,
and the catalog (storage + resumable commits + lineage)."""
