"""Write PLANS.md: the formatted physical plan of every headline query,
annotated with the properties that matter at 100 TB (what to look for:
PushedFilters on the scan, pruned ReadSchema, BroadcastHashJoin for
dims, TakeOrderedAndProject for top-k, a single PythonMapInArrow node
for extraction, no BatchEvalPython anywhere).

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "bbit_minhash": "signature fold once per doc; pair joins on "
                    "(id, perm) rows; both match counts in one "
                    "aggregate — no cartesian",

    "tabular_docs": "line Generate map-side; two vote aggregates with "
                    "map-side combine; struct-min argmax, no window",
    "burstiness": "sentence Generate map-side; one (doc) aggregate; "
                  "single sqrt over exact integer sums",

    "lang_vocab_hll": "register state keyed (group, bucket): shuffle "
                      "bounded by groups x m with map-side max-combine",
    "text_urls": "one codegen'd regexp_extract_all + outer generate; "
                 "zero exchange before the presentation sort",
    "novelty_curve": "groupBy(fingerprint) argmin bounded by distinct "
                     "content + bucket count join; no doc window",
    "bpe_merge_usage": "merge folds over the distinct-word table; one "
                       "token explode + broadcast merge-table join",
    "classifier_calibration": "broadcast model joins; one (bin) "
                              "aggregate over once-quantized sigmoid",

    "quantile_sketch": "sketch side: TakeOrdered k-min + a k-bounded "
                       "window; the exact side's single-partition "
                       "window IS the full-sort cost being audited",
    "bm25_mrr": "df/idf once per distinct term; every join on the "
                "query side is broadcast; per-query top-k = "
                "qid-partitioned window over bounded hit sets",
    "hybrid_rrf": "both rankings bounded at k; fusion = one (qid, id) "
                  "aggregate + bounded window; integer rrf terms",
    "packing_sweep": "ONE offsets pass (range-partition prefix) "
                     "serves every candidate L; per-L aggregates, no "
                     "token-granularity explode",
    "dsir_ess": "max shift rides a 1-row broadcast; decimal-exact "
                "u/u-squared sums; one corpus aggregate",
    "threshold_sweep": "single scan, all floors as aggregate "
                       "conjunctions over one quality expression",

    "zipf_fit": "one vocab-bounded HashAggregate + TakeOrderedAndProject "
                "top-100; the OLS window runs on 100 rows (the "
                "single-partition WindowExec is bounded by top_n, "
                "never the corpus)",
    "embedding_outliers": "centroid literal in the scan projection; two "
                          "TakeOrderedAndProject tails, no join, no "
                          "corpus shuffle",
    "corpus_overlap": "both KMV sketches are TakeOrdered k-mins over "
                      "the distinct-hash aggregate; the merge runs on "
                      "<= 2k rows; exact side shows the one full key "
                      "shuffle the sketch avoids",
    "ai_optout": "three matcher passes share the broadcast rule table; "
                 "per-agent aggregates are 1-row cross joins",
    "kn_ppl": "three BroadcastHashJoins + one 1-row broadcast cross "
              "join; the only corpus-keyed exchange is the (doc) "
              "partial-sum aggregate",
    "kn3_ppl": "five BroadcastHashJoins off ONE trigram-table pass; "
               "same single (doc) partial-sum exchange as kn_ppl",
    "url_traps": "template is a codegen'd regexp chain in the scan "
                 "projection; one (host, template) partial-distinct "
                 "aggregate + bounded host rollup join",
    "filter_funnel": "ONE scan: all four survivor counts in a single "
                     "HashAggregate (conjunction sums + distinct "
                     "fingerprint), stage rows from a Generate over "
                     "the 1-row result",
    "mixed_lang": "sentence Generate is map-side; one (doc, lang) "
                  "partial count then the per-doc struct-min argmax "
                  "aggregate — no window",
    "lexicon_scan": "pure Project over regexp_count chains — zero "
                    "exchange, zero UDF; WholeStageCodegen spans the "
                    "whole signal path",
    "luhn_cards": "candidate Generate prices in rare regex hits; the "
                  "HOF digit fold sits above the explode, never on "
                  "corpus bytes",
    "jl_audit": "projection = flat +- chains in the scan projection "
                "(no matrix join); the pair join is bounded by "
                "max_id",

    "lexicon_ac": "ONE mapInPandas stage over (id, text) — the "
                  "automaton rides the task closure, no join, no "
                  "shuffle; scales in terms without touching the plan "
                  "(the regexp chain's per-term projection cost is "
                  "gone)",
    "unigram_segment": "seed counts = one substring explode + "
                       "groupBy; vocab collapses to a driver-bounded "
                       "literal in the Viterbi kernel's closure; the "
                       "top-words TakeOrdered bounds the audited set",
    "fuzzy_linkage": "candidate pairs from ONE equi-join on the "
                     "16-char block key (no cartesian, "
                     "plan-asserted); levenshtein on bounded "
                     "prefixes JVM-side; components iterate over "
                     "match pairs only",
    "vocab_growth_hll": "register state bounded by buckets x m; "
                        "cumulative max windows PARTITION BY hash "
                        "bucket; exact side is the audited "
                        "non-scaling path",
    "term_proximity": "merge-scan: one doc-partitioned lag window "
                      "over filtered positions — no pair join "
                      "(the oracle runs the pair join as truth)",
    "min_cover": "k conditional cumulative maxes on ONE "
                 "doc-partitioned window + least() — linear in "
                 "occurrences vs the oracle's 3-way position join",
    "signal_corr": "two range-partition prefix ranks (no single-task "
                   "window), one co-keyed join, wide-decimal "
                   "integral-div rho in a single aggregate",
    "pq_index": "build-once lifecycle: the shown plan reads STORED "
                "codes from the index parquet — ADC is m element_at "
                "lookups + a sum in the scan Project, shortlist is "
                "TakeOrderedAndProject, re-rank joins a broadcast "
                "shortlist; no training job anywhere in the query plan",
    "warc_extract": "binaryFile scan = one file per task (WARC is not "
                    "byte-splittable); ONE mapInPandas splitter emits "
                    "pages rows; the per-host report is a single "
                    "map-side-combined aggregate",
    "curation_pipeline": "gate -> dedup -> quota sample in ONE plan: "
                         "the quality gate is a codegen'd Filter under "
                         "the fingerprint aggregate's map side, the "
                         "keep rule is a struct-min partial agg, the "
                         "sample reuses the range-partition prefix-rank "
                         "engine (no unpartitioned Window), per-lang "
                         "aggregates join at bounded cardinality",
    "filter_pushdown": "all three predicates appear in PushedFilters on "
                       "the parquet scan; ReadSchema carries only the 3 "
                       "touched columns",
    "pricing_summary": "partial_sum/partial_avg before the exchange = "
                       "map-side combine; ReadSchema pruned to 7 of 16 "
                       "columns",
    "top_customers": "two BroadcastHashJoins (no sort-merge, no shuffle "
                     "of the fact side beyond the agg) + "
                     "TakeOrderedAndProject (top-k without global sort)",
    "salted_agg": "two HashAggregate pairs: (key, salt) then key — each "
                  "hot key's load spread over 16 reducers",
    "minhash_near_dups": "no CartesianProduct / BroadcastNestedLoopJoin "
                         "anywhere: candidates come from the banded "
                         "equi-join",
    "soft_dedup": "components run over the PAIR set only; one count "
                  "shuffle sizes clusters; singletons arrive via LEFT "
                  "ANTI against the member ids — the corpus never joins "
                  "itself",
    "source_prior": "the corpus side reaches the final join through ZERO "
                    "shuffles: group sums + the 1-row global mean are the "
                    "only exchanges, and both come back as broadcasts "
                    "(BroadcastHashJoin + 1-row BroadcastNestedLoopJoin)",
    "extraction_pipeline": "exactly one PythonMapInArrow stage (all "
                           "kernels fused); the pages scan reads only "
                           "url/warc_ts/html/lang — the naive text dump "
                           "is pruned",
    "simhash_near_dups": "pigeonhole segments feed ONE equi-join shuffle "
                         "on (segment_id, value); exact hamming verify "
                         "after distinct — no cross join, recall 1 by "
                         "construction",
    "embedding_near_dups": "band buckets from one ArrowEvalPython matmul "
                           "stage; candidate equi-join on (band, bucket); "
                           "vectorized verify only on candidates",
    "nested_fields": "3-level struct built in one Project; leaf "
                     "projections stay columnar (nested schema pruning "
                     "plan-tested in test_plans)",
    "line_prune": "line DF via one shuffle on the line value, frequent "
                  "lines removed with a LEFT ANTI join, order-preserving "
                  "rebuild in one groupBy — no window over the corpus",
    "pack_sequences": "range-partition two-phase prefix sum: partition "
                      "offsets enter as a BroadcastHashJoin (never plan "
                      "literals) and the running sum windows WITHIN range "
                      "partitions — no single-partition global window, no "
                      "id-density assumption",
    "dedup_clusters": "iterative connected components: each round is one "
                      "shuffle on the edge endpoint (partial-min map-side) "
                      "+ one label self-join; localCheckpoint truncates "
                      "lineage so the plan stays round-sized (shown plan = "
                      "pair generation + final round)",
    "cer_gate": "the length-gap bound and the levenshtein DP live in one "
                "codegen'd CASE WHEN — gated rows never evaluate the DP "
                "branch; whole query is scan -> partial agg -> final agg",
    "semantic_dedup": "centroid assignment is ONE ArrowEvalPython map "
                      "stage (broadcast k x dim matrix, no join); pairs "
                      "come from a single equi-join shuffle on cell; "
                      "component resolution touches only above-threshold "
                      "pairs (shown plan = pairing + final CC round)",
    "decontaminate": "benchmark gram hashes enter as a BroadcastHashJoin "
                     "build side — corpus grams are generated and joined "
                     "map-side; every Exchange after the join carries only "
                     "(doc_id, gram_hash) HITS (partial-distinct absorbed "
                     "map-side) or final rows, never corpus grams",
    "dsir_select": "the <=buckets-row log-ratio table (fit shuffles only "
                   "(bucket, partial-count) pairs, map-side combine) is the "
                   "BroadcastHashJoin build side of the scoring join — "
                   "corpus grams never shuffle; per-doc weight agg is the "
                   "one corpus shuffle (map-side combined to a row per doc "
                   "per partition); selection is TakeOrderedAndProject",
    "shard_manifest": "shard assignment is a map-side integer div on the "
                      "packed seq_id; the manifest agg is one map-side-"
                      "combined shuffle keyed by shard_id — manifest rows "
                      "scale with shard count, not sequence count",
    "shuffle_corpus": "the permutation is the range-partition prefix-rank "
                      "engine: one range Exchange on the hash key, "
                      "partition offsets enter as a BroadcastHashJoin, "
                      "ranks window WITHIN range partitions — no global "
                      "single-task window, no orderBy(rand())",
    "ppl_filter": "both LM count tables are BroadcastHashJoin build sides "
                  "(reference-corpus-sized) — corpus bigrams never "
                  "shuffle; the per-doc NLL agg is the one corpus shuffle "
                  "(map-side combined); the head/middle/tail cut reuses "
                  "the range-partition rank engine",
    "domain_blocklist": "literal-blocklist path: suffix generation + "
                        "array_intersect are a single map-side Project "
                        "pipelined into the scan — no join, no shuffle "
                        "before the distinct; the UT1-scale path is a "
                        "suffix equi-join (pytest-asserted no nested "
                        "loop)",
    "chunk_documents": "transform(sequence)+explode in one Project over "
                       "the scan — map-only, zero Exchange, zero Python",
    "tfidf_topk": "df table derived FROM the tf aggregate (no second "
                  "corpus scan, no countDistinct); token join sized by "
                  "AQE; the per-doc top-k window partitions on doc_id — "
                  "groups bounded by document length",
    "corpus_split": "split assignment is a codegen'd CASE over a hash "
                    "inside the scan's Project — the only Exchange "
                    "belongs to the report aggregation, not the split",
    "kgram_dedup": "gram keys are 16-byte fingerprint structs (never "
                   "gram strings) through the argmin groupBy and the "
                   "join-back; map-side partial agg absorbs hot grams; "
                   "no window over the gram key anywhere",
    "url_latest": "revisit policy is ONE HashAggregate pair on the "
                  "canonical url — partial max_by/count before the "
                  "Exchange means a million-revision url reaches the "
                  "reducer as one candidate per map partition; no per-url "
                  "window sort anywhere",
    "bpe_pair_counts": "the per-merge-round inner job of train_bpe "
                       "(the returned merges table is driver-built, so "
                       "the plan that matters is this one): pair explode "
                       "feeds a partial HashAggregate — hot pairs are "
                       "pre-summed map-side before the one Exchange on "
                       "(p1, p2); runs over the distinct-WORD table, "
                       "never the corpus",
    "bpe_encode": "the merge folds are Projects over the distinct-word "
                  "aggregate only; tokens re-attach to documents via a "
                  "BroadcastHashJoin — the corpus is never shuffled by "
                  "the encoder (the groupBy(doc_id) rebuild is the one "
                  "corpus Exchange, map-side combined)",
    "outlink_hosts": "href harvest + host resolution are one codegen'd "
                     "Project over the pages scan (decode + "
                     "regexp_extract_all + explode — zero Python, zero "
                     "pre-agg Exchange); the only shuffle is the "
                     "(src,dst) HashAggregate pair with map-side "
                     "partial counts",
    "crawl_frontier": "rank table enters as a checkpoint scan (the "
                      "iterative PageRank materializes per round); the "
                      "politeness window partitions on host (bounded "
                      "groups) and the global top-n is "
                      "TakeOrderedAndProject — no global sort of the "
                      "frontier",
    "mirror_hosts": "per-host k-min via the range-partition prefix-rank "
                    "engine (no one-task-per-host window over the "
                    "corpus); candidates from an fp equi-join after the "
                    "fanout-guard semi-join; the estimator is array ops "
                    "in a Project — the only corpus-sized shuffle is "
                    "the distinct (host, fp)",
    "para_dedup": "the paragraph winner argmin groups on the 128-bit "
                  "md5 fingerprint with map-side partial min (a partial "
                  "SortAggregate before the Exchange — struct-min "
                  "buffers aren't hash-aggregable; its sort is bounded "
                  "per MAP partition): a viral paragraph's occurrences "
                  "pre-collapse before the shuffle and never sort in "
                  "one window task; fingerprint join-back and the "
                  "order-preserving per-doc rebuild are the only other "
                  "Exchanges",
    "pack_spans": "document spans are one extra map-side-combined "
                  "(seq_id, doc) HashAggregate pair over the shared "
                  "packed-slot core — not an O(seq_len^2) per-sequence "
                  "array fold; the tokenize cost stays persisted in "
                  "phase 1 and is paid once across both branches",
    "dedup_best": "keep-best resolution adds two map-side-combined "
                  "per-cluster aggregates (max score, then min id among "
                  "the maximizers) after the CC rounds; scores attach "
                  "by a node-id equi-join — no window over cluster "
                  "members, so a mega-cluster never sorts in one task",
    "pagerank_round": "one PageRank iteration (the loop body of "
                      "linkgraph.pagerank, pre-localCheckpoint): rank "
                      "join on src + partial_sum before the dst "
                      "Exchange (map-side combine absorbs hot dst "
                      "hosts); the 1-row dangling aggregate re-enters "
                      "via BroadcastNestedLoopJoin — a 1-row broadcast, "
                      "the one place that operator is the right plan",
    "spam_classifier": "the NB fit is JOIN-FREE (label rides the gram "
                       "explosion; the (label, bucket) agg shuffles at "
                       "most k*4096 keys with map-side combine); the "
                       "scorer joins a BROADCAST cond/labels model and "
                       "shuffles once on (doc, label) — the corpus "
                       "never joins itself, no BatchEvalPython",
    "bm25_topk": "postings build is ONE (doc, term) shuffle with "
                 "map-side combine; the |query|-row idf table enters "
                 "as a broadcast; top-k is TakeOrderedAndProject — "
                 "never a global sort; df/N stats ride a 1-row "
                 "broadcast cross join, no driver round trip",
    "video_overlap": "frame sampling + phash are Arrow-batched "
                     "MapInPandas co-partitioned on media_id (no "
                     "BatchEvalPython); the overlap join is ONE "
                     "equi-join shuffle keyed on phash (group size = "
                     "frames sharing identical content) and a "
                     "map-side-combined pair aggregate — no cross join",
    "collocations": "bigrams from ONE codegen'd window lead (the "
                    "HOF-cliff rule); unigram+bigram counts are "
                    "map-side-combined vocabulary-bounded aggregates; "
                    "count joins broadcast; totals ride a 1-row "
                    "broadcast cross join; TakeOrderedAndProject "
                    "top-k",
    "page_metadata": "title/description/canonical are ONE map-side "
                     "Project of codegen'd regexp_extracts over the "
                     "bounded ISO-8859-1 prefix decode — zero shuffle, "
                     "zero UDF, pipelined into the scan. Honest caveat: "
                     "THIS oracle-harness variant (injection CASE x six "
                     "field grammars in one Project) overflows the JVM "
                     "64 KB method limit at runtime and falls back to "
                     "interpreted expressions for the stage (logged "
                     "ERROR CodeGenerator, execution correct); the "
                     "PRODUCTION operator without the test injection "
                     "compiles clean (verified standalone)",
    "phrase_hits": "the term filter prunes the postings before the "
                   "per-doc regroup; the whole matcher is an "
                   "array_intersect chain over slot-shifted position "
                   "arrays — no join beyond the regroup, no window, "
                   "no UDF; both phrases share one persisted postings "
                   "build",
    "heading_outline": "one codegen'd regexp_extract_all + map-side "
                       "posexplode pipelined into the scan — the only "
                       "Exchange is the presentation sort; zero UDF, "
                       "zero array lambdas",
    "html_tables": "three chained regexp_extract_all + posexplode "
                   "stages fuse into ONE map-side codegen span over "
                   "the scan — fan-out bounded by scan_bytes, the "
                   "only Exchange is the presentation sort",
    "jsonld_entities": "block harvest + strict JSON parse + three "
                       "path extractions fuse into one codegen'd "
                       "Project — map-only, zero shuffle before the "
                       "presentation sort, zero Python",
    "hreflang_alternates": "link-tag harvest + per-tag attribute "
                           "extracts fuse into one map-side "
                           "regexp_extract_all + posexplode span — "
                           "zero shuffle before the presentation "
                           "sort, zero UDF",
    "bitext_pairs": "map-side hreflang harvest, then ONE url-key "
                    "equi-join back against the corpus (alternates.href "
                    "⋈ pages.url) — both sides corpus-sized at scale, "
                    "so no broadcast assumption; the 1-row min-ar "
                    "target is a broadcast",
    "og_metadata": "all four og: fields are ONE map-side Project of "
                   "codegen'd regexp_extracts — zero shuffle, zero "
                   "UDF; same 64 KB-codegen caveat as page_metadata "
                   "on the oracle-harness injection variant only",
    "rdfa_props": "tag harvest + per-match property/content/text "
                   "extracts fuse into one map-side span — zero "
                   "shuffle before the presentation sort, zero UDF",
    "microdata_props": "tag harvest + per-match prop/content/text "
                       "extracts fuse into one map-side "
                       "regexp_extract_all + posexplode span — zero "
                       "shuffle before the presentation sort, zero "
                       "UDF",
    "sitemap_urls": "two map-side regexp_extract_all + posexplode "
                    "arms unioned — zero shuffle before the "
                    "presentation sort, zero UDF",
    "sitemap_decls": "one narrow line posexplode + codegen'd field "
                     "filter over the per-host robots body — the only "
                     "Exchange is the host distinct of the synthesis",
    "feed_items": "two map-side regexp_extract_all + posexplode arms "
                  "unioned (rss items, atom entries) — zero shuffle "
                  "before the presentation sort, zero UDF",
    "feed_discovery": "link-tag harvest + type filter + href extract "
                      "in one map-side span — zero shuffle before "
                      "the presentation sort, zero UDF",
    "url_features": "every feature is a codegen'd JVM expression in "
                    "ONE map-side Project over the url column alone "
                    "(ReadSchema prunes to url) — zero shuffle, zero "
                    "UDF; the tiny segment-filter HOF runs on ~5-"
                    "element arrays, far below the interpreter cliff",
    "readability": "counts + floored micro divisions in one map-side "
                   "Project over (doc_id, text) — zero shuffle, zero "
                   "UDF, no HOF lambdas (split-size counting only)",
    "host_gini": "one map-side-combined count shuffle over pages; the "
                 "rank (round 5) runs through the range-partition "
                 "prefix-rank engine — range Exchange on (stratum, "
                 "cnt, host), offsets enter as a BroadcastHashJoin, "
                 "every Window carries a partition spec "
                 "(plan-asserted); no one-task rank at 10^8-host "
                 "cardinality",
    "template_spam": "skeleton strip + hash are map-side (the shuffle "
                     "key is the 8-byte md5-int60, never the 4 KB "
                     "skeleton); ONE (host, skeleton) count shuffle "
                     "map-side combined, then the host rollup",
    "image_captions": "img-tag harvest + per-tag src/alt extracts in "
                      "one map-side regexp_extract_all + posexplode "
                      "span — zero shuffle before the presentation "
                      "sort, zero UDF",
    "media_links": "media-tag harvest + element/src extracts in one "
                   "map-side span — zero shuffle before the "
                   "presentation sort, zero UDF",
    "embeds": "iframe/embed-tag harvest + element/src extracts in one "
              "map-side span — zero shuffle before the presentation "
              "sort, zero UDF",
    "charset_report": "one map-side declaration extract + bucketing, "
                      "then a single map-side-combined count shuffle",
    "page_features": "every feature a codegen'd regexp_count/rlike "
                     "over ONE decoded prefix in ONE map-side Project "
                     "— zero explode, zero shuffle, zero UDF; the "
                     "classifier-facing wide table pays nothing where "
                     "the record extractors pay a Generate",
    "list_items": "two chained regexp_extract_all + posexplode stages "
                  "fuse into ONE map-side codegen span (the "
                  "heading/table pattern) — zero shuffle before the "
                  "presentation sort, zero UDF",
    "pagination": "link-tag harvest map-side; first-wins is an argmin "
                  "struct-min groupBy on url (map-side combined) — "
                  "the one shuffle",
    "linewrap_repair": "injection + repair + hash all fuse into ONE "
                       "zero-shuffle codegen Project before the final "
                       "agg — the reflow pass costs a scan, nothing "
                       "else",
    "quote_spans": "no CartesianProduct: anchors come from the gram "
                   "equi-join AFTER the hot-gram guard agg; the "
                   "islands merge is one (pair, diagonal) window; "
                   "gram keys are 8-byte md5-int60s, never gram "
                   "strings, through both shuffles",
    "mixture_sample": "corpus shuffles once for capacities and once "
                      "for the per-stratum cum-sum walk; the "
                      "water-filling itself runs over the 20-row "
                      "strata table (single-partition windows are the "
                      "intended plan there) and comes back as a "
                      "broadcast",
    "vocab_growth": "per-type argmin is a groupBy (map-side combined, "
                    "bounded by vocabulary size) — no window over "
                    "types or docs; the cumulative window sees "
                    "#buckets rows",
    "sentences": "protect/mark/restore chain is one codegen'd string "
                 "Project; posexplode is the only row expansion — "
                 "zero shuffle before the presentation sort",
    "reshard_plan": "both HRW assignments are map-side md5-argmax "
                    "columns of the SAME scan; one groupBy on the "
                    "(old, new) pair",
    "compression_profile": "one ArrowEvalPython (the zlib kernel) over "
                           "the pruned 3-column scan; ratio/flag "
                           "arithmetic stays JVM-side around it; no "
                           "BatchEvalPython anywhere",
    "curriculum": "exact global rank via repartitionByRange + bounded "
                  "driver offsets (the prefix-rank engine) — no "
                  "single-task global window; the count re-enters as "
                  "a 1-row broadcast",
    "recrawl": "one per-page lag window over bounded fetch history + "
               "one groupBy(page) — no joins",
    "bitext_align": "no explode: sentence/length/ratio arrays stay "
                    "in-row; ONE pair equi-join is the only shuffle",
    "winnow_fp": "only 8-byte gram hashes explode (text never rides "
                 "the shuffle); rightmost-min is a per-doc frame "
                 "window over gram counts",
    "table_triples": "map-side table_records fan-out, one per-table "
                     "stats aggregate, two bounded joins on (url, "
                     "table_pos[, col_pos])",
    "hll_cardinality": "one groupBy(bucket) with map-side combine -> "
                       "m register rows regardless of corpus size; "
                       "the estimate is a 1-row aggregate",
    "pq_search": "encoding + ADC are map-only constant-literal "
                 "lookups; TakeOrderedAndProject for the shortlist "
                 "and the re-rank — the corpus never shuffles",
    "contamination_fraction": "hits pass: broadcast gram semi-join, "
                              "groupBy carries ONLY hit rows; sizes "
                              "pass is a pure projection (no gram "
                              "materialization); final join broadcasts "
                              "the hit table — zero corpus-sized "
                              "shuffles",
    "containment": "inverted-index equi-join only (shared shingles), "
                   "two broadcast size joins; no CartesianProduct / "
                   "BroadcastNestedLoopJoin",
    "lsh_audit": "truth via shingle equi-join (no CartesianProduct), "
                 "candidates via band equi-join, full-outer on pairs "
                 "only; one-row final aggregate",
    "semantic_decontaminate": "ONE ArrowEvalPython stage over the "
                              "corpus after the bounded benchmark "
                              "collect — no Exchange, no Join before "
                              "the presentation sort",
    "graph_stats": "degree aggregates + one edge self-join; 1-row "
                   "aggregates return as broadcasts — the node set "
                   "shuffles once",
    "sessionize": "ONE shuffle on user_id shared by the lag/running-sum "
                  "window chain AND the session aggregate (no second "
                  "Exchange)",
    "contamination_spans": "positions ride the gram posexplode for "
                           "free; broadcast semi-join keeps only hit "
                           "rows before the groupBy",
}

# synthetic plan targets: operators whose queries() entry returns a
# driver-built table — explain the real inner job instead
def _bpe_pair_counts(spark, sf_dir):
    import pyspark.sql.functions as F  # noqa: F401
    from ocr_engine_spark.functions.bpe import _pair_counts, word_table
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _pair_counts(word_table(docs))


def _pagerank_round(spark, sf_dir):
    # one un-checkpointed iteration body over a synthetic edge list
    import pyspark.sql.functions as F
    e = (spark.range(300)
         .select((F.col("id") % 50).alias("s"),
                 ((F.col("id") * 7 + 1) % 50).alias("d"))
         .where(F.col("s") != F.col("d")).distinct())
    deg = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"))
    nodes = (e.select(F.col("s").alias("node"))
             .unionByName(e.select(F.col("d").alias("node"))).distinct())
    ranks = nodes.withColumn("rank", F.lit(10 ** 9).cast("long"))
    r = ranks.join(deg, "node", "left")
    linked = r.where(F.col("deg").isNotNull())
    shares = (e.join(linked, e["s"] == linked["node"])
              .select(F.col("d").alias("node"),
                      F.expr("rank div deg").alias("share")))
    contrib = shares.groupBy("node").agg(F.sum("share").alias("contrib"))
    dang = (r.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dangling")))
    return (nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select("node", F.expr(
                "3000000 + (85 * (coalesce(contrib, CAST(0 AS BIGINT))"
                " + (dangling div 50))) div 100").alias("rank")))

HEADLINE = ["filter_pushdown", "pricing_summary", "top_customers",
            "salted_agg", "minhash_near_dups", "simhash_near_dups",
            "embedding_near_dups", "nested_fields", "line_prune",
            "pack_sequences", "pack_spans", "dedup_clusters",
            "dedup_best", "para_dedup", "cer_gate",
            "semantic_dedup", "decontaminate", "dsir_select",
            "shard_manifest", "shuffle_corpus", "ppl_filter",
            "domain_blocklist", "chunk_documents", "tfidf_topk",
            "corpus_split", "kgram_dedup",
            "url_latest", "bpe_pair_counts", "bpe_encode",
            "outlink_hosts", "pagerank_round", "crawl_frontier",
            "mirror_hosts",
            "spam_classifier", "bm25_topk", "video_overlap",
            "phrase_hits", "collocations", "page_metadata",
            "heading_outline", "html_tables", "jsonld_entities",
            "hreflang_alternates", "bitext_pairs", "og_metadata",
            "sitemap_urls", "sitemap_decls", "microdata_props",
            "feed_items", "feed_discovery", "url_features",
            "readability", "host_gini", "template_spam",
            "image_captions", "media_links", "pagination",
            "list_items", "rdfa_props", "embeds", "charset_report",
            "page_features",
            "soft_dedup", "source_prior",
            "linewrap_repair", "quote_spans", "mixture_sample",
            "vocab_growth", "sentences", "reshard_plan",
            "compression_profile", "curriculum", "recrawl",
            "bitext_align", "winnow_fp", "table_triples",
            "hll_cardinality", "pq_search",
            "contamination_fraction", "lsh_audit", "containment",
            "semantic_decontaminate", "graph_stats", "sessionize",
            "contamination_spans",
            "zipf_fit", "embedding_outliers", "corpus_overlap",
            "ai_optout", "kn_ppl", "kn3_ppl", "url_traps",
            "filter_funnel", "mixed_lang", "lexicon_scan",
            "luhn_cards", "jl_audit",
            "quantile_sketch", "bm25_mrr", "hybrid_rrf",
            "packing_sweep", "dsir_ess", "threshold_sweep",
            "lang_vocab_hll", "text_urls", "novelty_curve",
            "bpe_merge_usage", "classifier_calibration",
            "tabular_docs", "burstiness", "bbit_minhash",
            "pq_index", "warc_extract", "curation_pipeline",
            "lexicon_ac", "unigram_segment", "fuzzy_linkage",
            "vocab_growth_hll", "term_proximity", "min_cover",
            "signal_corr",
            "extraction_pipeline"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from ocr_engine_spark.engine.session import build_session

    spark = build_session("plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = ["# PLANS — formatted physical plans of the headline queries",
           "",
           "Generated by `python tools/explain_plans.py` (sf0.001 inputs; "
           "plans are scale-independent). Each section notes the plan "
           "property that matters at 100 TB.", ""]
    qs = entrymod.queries()
    qs["bpe_pair_counts"] = _bpe_pair_counts
    qs["pagerank_round"] = _pagerank_round
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.collect()  # AQE: materialize the FINAL plan
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}")
        out.append("")
        if name in NOTES:
            out.append(f"**Why this plan:** {NOTES[name]}")
            out.append("")
        out.append("```")
        text = buf.getvalue().rstrip()
        head, _, detail = text.partition("\n\n")
        out.append(head)
        out.append("```")
        # evidence lines from the node details (the tree alone doesn't
        # carry PushedFilters / ReadSchema / join types)
        keep = [ln.strip() for ln in detail.splitlines()
                if any(k in ln for k in (
                    "PushedFilters", "ReadSchema", "Location",
                    "BroadcastHashJoin", "TakeOrderedAndProject",
                    "PythonMapInArrow", "Arguments: [id=",
                ))
                and "Location" not in ln]
        if keep:
            out.append("")
            out.append("Scan evidence:")
            out.append("```")
            out.extend(dict.fromkeys(keep))  # dedupe, keep order
            out.append("```")
        out.append("")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
