#!/usr/bin/env python3
"""Measure the set-relation non-degeneracy of a rich fixture
(VERDICT r11 #3): the shipped documents/events fixtures are
semantically saturated (31-word vocabulary, every user does every
event_type), so the overlap/coverage gates (q222 source-overlap
jaccard, q351 audience intersections, q343 vocab tiers, q352 score
spread) pass on degenerate ~0%/100% set relations. This script
prints the realized overlap fractions on a generated rich fixture so
SURVEY can document that the gates discriminate there.

Usage: check_rich_fixture.py <fixtureDir>   (expects documents.parquet,
events.parquet written by `Profile rich-fixture <fixtureDir>`)
"""
import os
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_rich_fixture"
con = duckdb.connect()


def reg(table):
    p = f"{d}/{table}.parquet"
    if os.path.isdir(p):  # Spark dir output (pre-flatten)
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{p}'")


reg("documents")
reg("events")

print("== q222 source-overlap: realized bigram jaccard per source pair ==")
rows = con.execute("""
WITH t AS (SELECT source, string_split(trim(text), ' ') AS toks
           FROM documents),
st AS (SELECT DISTINCT source,
         unnest(list_transform(range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i+1])) AS tok
       FROM t WHERE len(toks) >= 2),
sz AS (SELECT source, count(*) AS nv FROM st GROUP BY 1),
p AS (SELECT a.source s1, b.source s2, count(*) AS common
      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2)
SELECT min(common::DOUBLE / (za.nv + zb.nv - common)),
       median(common::DOUBLE / (za.nv + zb.nv - common)),
       max(common::DOUBLE / (za.nv + zb.nv - common)), count(*)
FROM p JOIN sz za ON s1 = za.source JOIN sz zb ON s2 = zb.source
""").fetchall()
print("  jaccard min/median/max/pairs:", rows[0])

print("== q351 audiences: per-(day,type-pair) intersection fraction ==")
rows = con.execute("""
WITH t AS (SELECT DISTINCT CAST(dayofmonth(ts) AS INT) d, event_type,
             user_id FROM events WHERE dayofmonth(ts) <= 3),
sz AS (SELECT d, event_type, count(*) n FROM t GROUP BY 1, 2),
p AS (SELECT a.d, a.event_type ta, b.event_type tb, count(*) nb
      FROM t a JOIN t b ON a.d = b.d AND a.user_id = b.user_id
        AND a.event_type < b.event_type GROUP BY 1, 2, 3)
SELECT min(nb::DOUBLE / LEAST(x.n, y.n)),
       median(nb::DOUBLE / LEAST(x.n, y.n)),
       max(nb::DOUBLE / LEAST(x.n, y.n)), count(*),
       min(LEAST(x.n, y.n)), max(GREATEST(x.n, y.n))
FROM p JOIN sz x ON p.d = x.d AND ta = x.event_type
       JOIN sz y ON p.d = y.d AND tb = y.event_type
""").fetchall()
print("  |A∩B|/min(|A|,|B|) min/median/max/pairs, audience min/max:",
      rows[0])

print("== q343 vocab: Heaps growth + tier structure ==")
rows = con.execute("""
WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) tok
           FROM documents)
SELECT count(DISTINCT tok) AS vocab, count(*) AS tokens,
       count(DISTINCT tok) FILTER (WHERE tok LIKE 'c%') AS shared_types
FROM t""").fetchall()
print("  vocab/tokens/shared-stop-types:", rows[0])
rows = con.execute("""
WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) tok
           FROM documents),
f AS (SELECT tok, count(*) c FROM t GROUP BY 1)
SELECT sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
       sum(CASE WHEN c >= 100 THEN 1 ELSE 0 END) AS head100,
       max(c) FROM f""").fetchall()
print("  hapax/head(>=100)/max-freq:", rows[0])

print("== q352 difficulty: doc-length spread ==")
rows = con.execute("""
WITH t AS (SELECT len(string_split(trim(text), ' ')) n FROM documents)
SELECT min(n), median(n), max(n),
       count(DISTINCT n) FROM t""").fetchall()
print("  tokens/doc min/median/max/distinct:", rows[0])

print("== r14 streaming-tier planted slices (VERDICT r13 #6) ==")
# q120 stream-static dedup: all three statuses must be realized
rows = con.execute("""
WITH m AS (SELECT max(doc_id) // 2 AS mid FROM documents),
d1 AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
       FROM documents, m WHERE doc_id < mid),
d2 AS (SELECT doc_id, md5(lower(trim(text))) AS fp
       FROM documents, m WHERE doc_id >= mid)
SELECT count(*) FILTER (WHERE fp IN (SELECT fp FROM d1)) AS dropped,
       count(*) FILTER (WHERE fp NOT IN (SELECT fp FROM d1)
         AND fp IN (SELECT fp FROM d2 GROUP BY fp HAVING count(*) > 1))
         AS batch_dups,
       count(*) FILTER (WHERE fp NOT IN (SELECT fp FROM d1)) AS kept
FROM d2""").fetchall()
print("  q120 dropped/batch-dup/kept:", rows[0])
assert rows[0][0] > 0 and rows[0][1] > 0 and rows[0][2] > rows[0][1], \
    "q120 slices degenerate"
# q144 contamination: flagged AND sub-threshold populations
rows = con.execute("""
WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
           FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, len(toks) - 2),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS g
      FROM t WHERE len(toks) >= 3),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 20 = 0),
n AS (SELECT g.doc_id, count(*) AS ns FROM g JOIN bench USING (g)
      WHERE g.doc_id % 20 <> 0 GROUP BY 1)
SELECT count(*) FILTER (WHERE ns >= 10) AS flagged,
       count(*) FILTER (WHERE ns BETWEEN 1 AND 9) AS sub
FROM n""").fetchall()
print("  q144 flagged/sub-threshold:", rows[0])
assert rows[0][0] > 0 and rows[0][1] > 0, "q144 slices degenerate"
# interval-join family: every branch of the horizon algebra realized
rows = con.execute("""
WITH mx AS (SELECT to_timestamp(epoch_ms(max(ts)) / 1000.0) AS m
            FROM events),
p AS (SELECT l.event_id AS l_id
      FROM events l JOIN events r
        ON l.user_id = r.user_id
       AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTE
       AND l.event_id <> r.event_id)
SELECT
  (SELECT count(*) FROM p) AS matched,
  (SELECT count(*) FROM events l, mx
    WHERE l.ts + INTERVAL 5 MINUTE < mx.m - INTERVAL 2 HOUR
      AND l.event_id NOT IN (SELECT l_id FROM p)) AS left_null,
  (SELECT count(*) FROM events l, mx
    WHERE l.ts < mx.m - INTERVAL 2 HOUR
      AND NOT l.ts + INTERVAL 5 MINUTE < mx.m - INTERVAL 2 HOUR
      AND l.event_id NOT IN (SELECT l_id FROM p)) AS asym_right_only,
  (SELECT count(*) FROM events l, mx
    WHERE NOT l.ts < mx.m - INTERVAL 2 HOUR
      AND l.event_id NOT IN (SELECT l_id FROM p)) AS late_absent
""").fetchall()
print("  interval matched/left-null/asym-right-only/late-absent:",
      rows[0])
assert all(c > 0 for c in rows[0]), "interval-join slices degenerate"
print("  streaming-tier slices: ALL NON-DEGENERATE")
