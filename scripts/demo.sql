-- graft engine demo — run: sbt "runMain graft.Cli -f scripts/demo.sql"
-- (tables register from SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01)

-- the flagship: Spark-parity greatest, incl. null-skipping and NaN order
SELECT greatest(1.5, cast('NaN' AS DOUBLE), 2.5) AS nan_wins,
       greatest(NULL, 7, NULL) AS null_skipped;

-- the reference-coercion variant: bool + int coerces to LONG (DataFusion
-- planner rule), where Spark's own greatest would reject it
SELECT greatest_ref(true, 5) AS ref_coerced;

-- TPC-H Q1 shape over the testdata
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus;

-- custom codegen'd expressions: dot_product over embeddings, gcd/lcm
SELECT vec_id, round(dot_product(embedding, embedding), 4) AS norm_sq
FROM embeddings ORDER BY vec_id LIMIT 5;
SELECT gcd(54, 24) AS g, lcm(4, 6) AS l;

-- the weighted-percentile UDAF
SELECT l_returnflag, weighted_median(l_extendedprice, l_quantity) AS wmedian
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;

-- text analysis: language-id heuristic tiers
SELECT lang, predicted, COUNT(*) AS n FROM (
  SELECT lang,
    CASE WHEN size(filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'is', 'and')))
              / cast(size(split(text, ' ')) AS DOUBLE) >= 0.15
         THEN 'en' ELSE 'other' END AS predicted
  FROM documents) t
GROUP BY lang, predicted ORDER BY lang, predicted;
