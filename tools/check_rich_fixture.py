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
import sys
import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_rich_fixture"
con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")

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
