-- ext_pagerank: DuckDB oracle (ANSI SQL over the shared parquet views).
-- Spark implementation in smartpipeline_spark (see SURVEY.md 2.12).
WITH e AS (SELECT DISTINCT l.l_suppkey AS src, o.o_custkey AS dst
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
 nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
 deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
 nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
 r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
 r1 AS (
   SELECT n.id,
          0.15000000000000002 + 0.85 * (COALESCE(inf.s, 0.0) + dm.m / nn.n) AS rank
   FROM nodes n
   CROSS JOIN nn
   CROSS JOIN (SELECT COALESCE(CAST(SUM(CAST(r.rank AS DECIMAL(28,14))) AS DOUBLE), 0.0) AS m
               FROM r0 r LEFT JOIN deg d ON r.id = d.src
               WHERE d.src IS NULL) dm
   LEFT JOIN (SELECT e.dst AS id,
                     CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(28,14))) AS DOUBLE) AS s
              FROM r0 r JOIN deg d ON r.id = d.src JOIN e ON e.src = r.id
              GROUP BY e.dst) inf ON inf.id = n.id), r2 AS (
   SELECT n.id,
          0.15000000000000002 + 0.85 * (COALESCE(inf.s, 0.0) + dm.m / nn.n) AS rank
   FROM nodes n
   CROSS JOIN nn
   CROSS JOIN (SELECT COALESCE(CAST(SUM(CAST(r.rank AS DECIMAL(28,14))) AS DOUBLE), 0.0) AS m
               FROM r1 r LEFT JOIN deg d ON r.id = d.src
               WHERE d.src IS NULL) dm
   LEFT JOIN (SELECT e.dst AS id,
                     CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(28,14))) AS DOUBLE) AS s
              FROM r1 r JOIN deg d ON r.id = d.src JOIN e ON e.src = r.id
              GROUP BY e.dst) inf ON inf.id = n.id), r3 AS (
   SELECT n.id,
          0.15000000000000002 + 0.85 * (COALESCE(inf.s, 0.0) + dm.m / nn.n) AS rank
   FROM nodes n
   CROSS JOIN nn
   CROSS JOIN (SELECT COALESCE(CAST(SUM(CAST(r.rank AS DECIMAL(28,14))) AS DOUBLE), 0.0) AS m
               FROM r2 r LEFT JOIN deg d ON r.id = d.src
               WHERE d.src IS NULL) dm
   LEFT JOIN (SELECT e.dst AS id,
                     CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(28,14))) AS DOUBLE) AS s
              FROM r2 r JOIN deg d ON r.id = d.src JOIN e ON e.src = r.id
              GROUP BY e.dst) inf ON inf.id = n.id), r4 AS (
   SELECT n.id,
          0.15000000000000002 + 0.85 * (COALESCE(inf.s, 0.0) + dm.m / nn.n) AS rank
   FROM nodes n
   CROSS JOIN nn
   CROSS JOIN (SELECT COALESCE(CAST(SUM(CAST(r.rank AS DECIMAL(28,14))) AS DOUBLE), 0.0) AS m
               FROM r3 r LEFT JOIN deg d ON r.id = d.src
               WHERE d.src IS NULL) dm
   LEFT JOIN (SELECT e.dst AS id,
                     CAST(SUM(CAST(r.rank / d.deg AS DECIMAL(28,14))) AS DOUBLE) AS s
              FROM r3 r JOIN deg d ON r.id = d.src JOIN e ON e.src = r.id
              GROUP BY e.dst) inf ON inf.id = n.id)
SELECT id, FLOOR(rank * 1000000.0 + 0.5) / 1000000.0 AS rank
FROM r4
