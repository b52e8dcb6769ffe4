"""Seeded taxi-trip generator — deterministic re-expression of the
reference simulator's semantics (src/data_generator/taxi_trip_simulator.py:46-102):
fare = 2.50 + 2.50·miles + 0.50·minutes; payment weights
[.70,.25,.03,.02]; card tips 15-25% (70% of the time), other payments
5-15% (30% of the time); duration 5-120 min; total = Σ components.

Differences by design (SURVEY.md §7.3 item 5): everything derives from
``random.Random(seed)`` and a fixed ``base_time`` — no wall clock, no
uuid4 — so fixtures are reproducible and oracle-safe.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta
from random import Random

PAYMENT_TYPES = ["card", "cash", "no_charge", "dispute"]
PAYMENT_WEIGHTS = [0.70, 0.25, 0.03, 0.02]
PASSENGER_WEIGHTS = ([1, 2, 3, 4, 5], [0.6, 0.2, 0.1, 0.08, 0.02])

# 15 deterministic zones on a Manhattan-ish grid (S15 seed-data analog)
ZONES = [
    {
        "id": i,
        "name": f"Zone {i:02d}",
        "borough": ["Manhattan", "Brooklyn", "Queens"][i % 3],
        "lon": -74.00 + (i % 5) * 0.02,
        "lat": 40.70 + (i // 5) * 0.02,
    }
    for i in range(1, 16)
]

BASE_TIME = datetime(2025, 3, 1, 8, 0, 0)


def generate_trip(rng: Random, seq: int, base_time: datetime = BASE_TIME) -> dict:
    """One trip-completion event (plain dict, JSONL-serializable)."""
    pickup_zone = rng.choice(ZONES)
    dropoff_zone = rng.choice(ZONES)
    pickup_time = base_time + timedelta(minutes=rng.randint(0, 72 * 60))
    duration_min = rng.randint(5, 120)
    dropoff_time = pickup_time + timedelta(minutes=duration_min)
    distance = rng.uniform(0.5, 25.0)
    fare = 2.50 + distance * 2.50 + duration_min * 0.50
    payment = rng.choices(PAYMENT_TYPES, weights=PAYMENT_WEIGHTS)[0]
    if payment == "card":
        tip_pct = rng.uniform(0.15, 0.25) if rng.random() > 0.3 else 0.0
    else:
        tip_pct = rng.uniform(0.05, 0.15) if rng.random() > 0.7 else 0.0
    trip = {
        "trip_id": f"gen_{seq:08d}",
        "vendor_id": rng.choice([1, 2]),
        "pickup_datetime": pickup_time.isoformat() + "Z",
        "dropoff_datetime": dropoff_time.isoformat() + "Z",
        "passenger_count": rng.choices(*PASSENGER_WEIGHTS)[0],
        "trip_distance": round(distance, 2),
        "pickup_longitude": round(pickup_zone["lon"] + rng.uniform(-0.01, 0.01), 6),
        "pickup_latitude": round(pickup_zone["lat"] + rng.uniform(-0.01, 0.01), 6),
        "dropoff_longitude": round(dropoff_zone["lon"] + rng.uniform(-0.01, 0.01), 6),
        "dropoff_latitude": round(dropoff_zone["lat"] + rng.uniform(-0.01, 0.01), 6),
        "payment_type": payment,
        "fare_amount": round(fare, 2),
        "extra": rng.choice([0.0, 0.50, 1.0]),
        "mta_tax": 0.50,
        "tip_amount": round(fare * tip_pct, 2),
        "tolls_amount": rng.choices([0.0, 5.54, 6.12], weights=[0.8, 0.1, 0.1])[0],
        "pickup_location_id": pickup_zone["id"],
        "dropoff_location_id": dropoff_zone["id"],
        "event_timestamp": (base_time + timedelta(minutes=seq)).isoformat() + "Z",
    }
    trip["total_amount"] = round(
        trip["fare_amount"]
        + trip["extra"]
        + trip["mta_tax"]
        + trip["tip_amount"]
        + trip["tolls_amount"],
        2,
    )
    return trip


def generate_trips(n: int, seed: int = 42, base_time: datetime = BASE_TIME) -> list[dict]:
    rng = Random(seed)
    return [generate_trip(rng, i, base_time) for i in range(n)]


def corrupt_some(trips: list[dict], seed: int = 43, frac: float = 0.1) -> list[dict]:
    """Inject the reference's invalid classes (main.py:52-131) into a
    corpus: missing required field, reversed timestamps, non-positive
    distance/amount, unparseable timestamp."""
    rng = Random(seed)
    out = []
    for t in trips:
        t = dict(t)
        if rng.random() < frac:
            kind = rng.choice(
                ["missing_field", "ts_order", "validation", "ts_format"]
            )
            if kind == "missing_field":
                t[rng.choice(["pickup_datetime", "trip_distance", "total_amount"])] = None
            elif kind == "ts_order":
                t["pickup_datetime"], t["dropoff_datetime"] = (
                    t["dropoff_datetime"],
                    t["pickup_datetime"],
                )
            elif kind == "validation":
                t[rng.choice(["trip_distance", "total_amount"])] = -1.0
            else:
                t["pickup_datetime"] = "not-a-timestamp"
        out.append(t)
    return out


def write_jsonl(trips: list[dict], path: str, files: int = 1) -> list[str]:
    """Write trips as newline-delimited JSON across `files` shards
    (B11: the large-gen multi-file JSONL layout)."""
    os.makedirs(path, exist_ok=True)
    paths = []
    per = (len(trips) + files - 1) // files
    for i in range(files):
        chunk = trips[i * per : (i + 1) * per]
        if not chunk:
            break
        p = os.path.join(path, f"trips_{i:04d}.jsonl")
        with open(p, "w") as f:
            for t in chunk:
                f.write(json.dumps(t) + "\n")
        paths.append(p)
    return paths


def zones_rows() -> list[tuple]:
    """Seed rows for taxi_zones (S15), WKT geometry like the reference's
    'POINT(lon lat)' literals (sql/create_iceberg_tables.sql:126-143)."""
    return [
        (
            z["id"],
            z["name"],
            z["borough"],
            f"POINT({z['lon']:.4f} {z['lat']:.4f})",
        )
        for z in ZONES
    ]
