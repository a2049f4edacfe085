#!/usr/bin/env python3
"""DuckDB check of the reference-scale taxi-year run (dev tool, the
scale companion of check_oracle.py). `graft.Profile taxi-year` writes
a deterministic ~40M-row TLC-shaped year and the 7 TaxiPipeline output
tables; this recomputes all 7 from the same raw parquet in DuckDB and
compares (exact counts/keys, 1e-9-relative float aggregates — sum
order differs between engines at this row count, no r6 contract here).
Usage:
    python3 tools/check_taxi_year.py <rawDataDir> <outDir>
fare_anomalies' p99 threshold is approximate (GK sketch) on the Spark
side, so the check re-derives the EFFECTIVE threshold as the min fare
in Spark's output: `fare >= min_output_fare` selects exactly the same
row set whenever the filter `fare >= t` produced it (min_output_fare
is the smallest fare passing t, so the two predicates agree on every
row).
"""
import sys
import duckdb
import numpy as np

BASE = ["VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
        "passenger_count", "trip_distance", "RatecodeID",
        "store_and_fwd_flag", "PULocationID", "DOLocationID",
        "payment_type", "fare_amount", "extra", "mta_tax", "tip_amount",
        "tolls_amount", "improvement_surcharge", "total_amount",
        "congestion_surcharge", "Airport_fee"]


def main():
    raw, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    notnull = " AND ".join(f'"{c}" IS NOT NULL' for c in BASE)
    # feature layer, mirroring graft.ops.Features:
    #  - Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday
    #  - guarded ratios are NULL when the guard fails (CASE w/o ELSE)
    con.execute(f"""
      CREATE VIEW f0 AS
      SELECT *,
        hour(tpep_pickup_datetime) AS pickup_hour,
        dayofweek(tpep_pickup_datetime) + 1 AS pickup_dow,
        (epoch(tpep_dropoff_datetime) - epoch(tpep_pickup_datetime))
          / 60.0 AS trip_minutes,
        CASE WHEN fare_amount > 0
             THEN tip_amount / fare_amount END AS tip_pct,
        CASE WHEN trip_distance > 0
             THEN fare_amount / trip_distance END AS revenue_per_mile,
        CASE WHEN trip_distance < 1 THEN 'Very Short'
             WHEN trip_distance < 3 THEN 'Short'
             WHEN trip_distance < 5 THEN 'Medium'
             WHEN trip_distance < 10 THEN 'Long'
             ELSE 'Very Long' END AS distance_category
      FROM read_parquet('{raw}/*.parquet') WHERE {notnull}""")
    con.execute("""
      CREATE VIEW f AS
      SELECT *, CASE WHEN trip_minutes > 0
        THEN trip_distance / (trip_minutes / 60.0) END AS avg_speed_mph
      FROM f0""")

    n_ok = n_bad = 0

    def cmp(name, sql, keys):
        nonlocal n_ok, n_bad
        duck = con.execute(sql).df()
        spark = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        if list(duck.columns) != list(spark.columns):
            print(f"FAIL {name}: cols duck={list(duck.columns)} "
                  f"spark={list(spark.columns)}")
            n_bad += 1
            return
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_bad += 1
            return
        duck = duck.sort_values(keys).reset_index(drop=True)
        spark = spark.sort_values(keys).reset_index(drop=True)
        for c in duck.columns:
            a, b = duck[c], spark[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af = a.astype('float64').values
                bf = b.astype('float64').values
                ok = (np.isnan(af) & np.isnan(bf)) | np.isclose(
                    af, bf, rtol=1e-9, atol=1e-12, equal_nan=True)
            else:
                ok = (a.isna() & b.isna()).values | \
                    (a.astype(str) == b.astype(str)).values
            if not ok.all():
                i = int(np.argmax(~ok))
                print(f"FAIL {name}: col {c}[{i}] duck={a.iloc[i]!r} "
                      f"spark={b.iloc[i]!r}")
                n_bad += 1
                return
        print(f"OK   {name} ({len(duck)} rows)")
        n_ok += 1

    cmp("demand_heatmap", """
      SELECT PULocationID, pickup_hour, count(*) AS n_trips
      FROM f GROUP BY 1, 2""", ["PULocationID", "pickup_hour"])

    cmp("tip_trends", """
      SELECT PULocationID, payment_type, avg(tip_pct) AS avg_tip_pct,
             count(*) AS n_trips
      FROM f GROUP BY 1, 2""", ["PULocationID", "payment_type"])

    thr = con.execute(
        f"SELECT min(fare_amount) FROM "
        f"read_parquet('{out}/fare_anomalies/*.parquet')").fetchone()[0]
    cmp("fare_anomalies", f"""
      SELECT VendorID, tpep_pickup_datetime, PULocationID, DOLocationID,
             fare_amount, tip_amount, trip_distance
      FROM f WHERE fare_amount >= {thr!r}""",
        ["fare_amount", "tpep_pickup_datetime", "PULocationID",
         "DOLocationID", "tip_amount", "trip_distance", "VendorID"])

    cmp("trip_performance", """
      SELECT PULocationID, pickup_hour, pickup_dow,
             avg(trip_minutes) AS avg_trip_duration,
             avg(avg_speed_mph) AS avg_speed,
             avg(revenue_per_mile) AS avg_revenue_per_mile,
             avg(fare_amount) AS avg_fare,
             sum(fare_amount) AS total_revenue,
             count(*) AS n_trips,
             avg(trip_distance) AS avg_trip_distance,
             avg(tip_amount) AS avg_tip,
             avg(tip_pct) AS avg_tip_percentage,
             pickup_dow IN (1, 7) AS is_weekend
      FROM f GROUP BY 1, 2, 3""",
        ["PULocationID", "pickup_hour", "pickup_dow"])

    cmp("popular_routes", """
      SELECT PULocationID, DOLocationID, pickup_hour,
             count(*) AS n_trips,
             avg(trip_minutes) AS avg_duration,
             avg(fare_amount) AS avg_fare,
             avg(trip_distance) AS avg_distance,
             avg(tip_amount) AS avg_tip
      FROM f GROUP BY 1, 2, 3 HAVING count(*) >= 10""",
        ["PULocationID", "DOLocationID", "pickup_hour"])

    cmp("payment_analysis", """
      SELECT PULocationID, pickup_hour, payment_type,
             count(*) AS n_trips,
             avg(fare_amount) AS avg_fare,
             avg(tip_amount) AS avg_tip,
             avg(tip_pct) AS avg_tip_percentage,
             sum(fare_amount) AS total_revenue,
             CASE payment_type WHEN 1 THEN 'Credit Card'
               WHEN 2 THEN 'Cash' WHEN 3 THEN 'No Charge'
               WHEN 4 THEN 'Dispute' ELSE 'Unknown' END AS payment_method
      FROM f GROUP BY 1, 2, 3""",
        ["PULocationID", "pickup_hour", "payment_type"])

    cmp("distance_distribution", """
      SELECT PULocationID, pickup_hour, distance_category,
             count(*) AS n_trips,
             avg(fare_amount) AS avg_fare,
             avg(trip_minutes) AS avg_duration,
             avg(tip_amount) AS avg_tip,
             sum(fare_amount) AS total_revenue
      FROM f GROUP BY 1, 2, 3""",
        ["PULocationID", "pickup_hour", "distance_category"])

    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
