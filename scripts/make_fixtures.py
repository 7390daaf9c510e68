#!/usr/bin/env python
"""Deterministic bronze-fixture generator for the medallion pipeline.

Writes newline-delimited JSON envelope files under
``tests/fixtures/bronze/{source}/{YYYY}/{MM}/{DD}/batch.json`` — the
reference's object-store key layout (kafka_fashion_consumer.py:53-57)
with its message envelope (kafka_fashion_consumer.py:60-69) — for the
five raw sources of api_data_generator.py, including the messy value
encodings the conformance layer must clean (string prices, $-prefixes,
cents integers, %-strings, unit-suffixed weights, mixed ISO suffixes,
empty cells; api_data_generator.py:56-191).

Seeded (SEED below) and committed to git: regenerating produces
byte-identical files, so oracle SQL can read the same files.
"""

from __future__ import annotations

import json
import random
import shutil
from pathlib import Path

SEED = 20250601
DAYS = ["2025-06-01", "2025-06-02", "2025-06-03"]
ROOT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "bronze"

ISO_SUFFIXES = ["Z", "+00:00", ""]
SKUS = [f"SKU-{i:04d}" for i in range(1, 41)]
BUYERS = [
    "Harrods London", "Saks Fifth Avenue", "Galeries Lafayette", "Isetan Tokyo",
    "David Jones Sydney", "La Rinascente Milano", "El Corte Ingles Madrid",
    "Selfridges UK", "Nordstrom Seattle", "Lane Crawford Hong Kong",
    "Printemps Paris", "Holt Renfrew Toronto", "KaDeWe Berlin", "Myer Melbourne",
    "Bloomingdales NYC", "Takashimaya Singapore",
]
CUSTOMERS = [
    "alice chen", "bob kumar", "carla diaz", "dmitri ivanov", "emma watson",
    "farid hassan", "grace park", "hans muller", "ines lopez", "jon snow",
    "kate bishop", "liam oconnor", "maria silva", "noor ali", "olu adeyemi",
    "priya patel",
]
CARRIERS = ["DHL", "FedEx", "UPS", "SF Express"]


def iso(day: str, rng: random.Random) -> str:
    return (
        f"{day}T{rng.randrange(24):02d}:{rng.randrange(60):02d}:"
        f"{rng.randrange(60):02d}{rng.choice(ISO_SUFFIXES)}"
    )


def envelope(source: str, day: str, offset: int, raw: dict, rng: random.Random) -> dict:
    ts = f"{day}T{rng.randrange(24):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d}"
    return {
        "raw_api_data": raw,
        "kafka_metadata": {
            "topic": f"raw-{source}",
            "partition": offset % 3,
            "offset": offset,
            "stream_timestamp": ts,
            "bronze_timestamp": ts,
        },
    }


def gen_joor(day: str, d: int, rng: random.Random) -> list[dict]:
    rows = []
    for i in range(30):
        price = round(rng.uniform(40.0, 900.0), 2)
        rows.append(
            {
                "order_id": f"JOOR-{d:02d}{i:04d}",
                "customer": rng.choice(BUYERS) if rng.random() > 0.05 else None,
                "price": f"${price}" if rng.random() < 0.3 else str(price),
                "quantity": rng.randint(1, 40) if rng.random() > 0.05 else None,
                "sku": rng.choice(SKUS),
                "currency": rng.choice(["USD", "usd", "$"]),
                "date": iso(day, rng),
            }
        )
    return rows


def gen_shopify(day: str, d: int, rng: random.Random) -> list[dict]:
    rows = []
    for i in range(60):
        rows.append(
            {
                "id": 100000 * d + i,
                "customer_name": rng.choice(CUSTOMERS) if rng.random() > 0.05 else "",
                "total_price": f"{rng.uniform(15.0, 400.0):.2f}",
                "quantity": rng.randint(1, 5),
                "sku": rng.choice(SKUS),
                "created_at": iso(day, rng),
            }
        )
    return rows


def gen_tiktok(day: str, d: int, rng: random.Random) -> list[dict]:
    base_epoch = 1748736000 + 86400 * (d - 1)  # 2025-06-01T00:00:00Z
    rows = []
    for i in range(50):
        rows.append(
            {
                "order_id": f"TT-{d:02d}{i:04d}",
                "buyer": rng.choice(CUSTOMERS),
                "price_cents": rng.randint(500, 30000),
                "quantity": rng.randint(1, 8),
                "sku": rng.choice(SKUS),
                "live_stream": rng.random() < 0.6,
                "timestamp": base_epoch + rng.randrange(86400),
            }
        )
    return rows


def gen_freight(day: str, d: int, rng: random.Random, order_refs: list[str]) -> list[dict]:
    rows = []
    refs = rng.sample(order_refs, min(60, len(order_refs)))
    for i, ref in enumerate(refs):
        weight = round(rng.uniform(0.5, 25.0), 1)
        rows.append(
            {
                "shipment_id": f"SHP-{d:02d}{i:04d}",
                "order_reference": ref,
                "cost": f"${round(rng.uniform(5.0, 120.0), 2)}",
                "weight": f"{weight} {rng.choice(['kg', 'lbs'])}",
                "carrier": rng.choice(CARRIERS),
                "shipped_at": iso(day, rng),
            }
        )
    return rows


def gen_gsheets(day: str, d: int, rng: random.Random) -> list[dict]:
    data = [["Region", "Sales", "Growth"]]
    for region in ["North America", "EMEA", "APAC", "LATAM"]:
        sales = f"${rng.uniform(1000, 99000):,.2f}"
        growth = f"{rng.uniform(-5, 15):.1f}%" if rng.random() > 0.15 else ""
        data.append([region, sales, growth])
    return [{"sheet_name": f"weekly_sales_{day}", "data": data}]


def main() -> None:
    rng = random.Random(SEED)
    if ROOT.exists():
        shutil.rmtree(ROOT)
    n_files = n_rows = 0
    for d, day in enumerate(DAYS, start=1):
        joor = gen_joor(day, d, rng)
        tiktok = gen_tiktok(day, d, rng)
        refs = [r["order_id"] for r in joor] + [r["order_id"] for r in tiktok]
        per_source = {
            "joor": joor,
            "shopify": gen_shopify(day, d, rng),
            "tiktok": tiktok,
            "freight": gen_freight(day, d, rng, refs),
            "gsheets": gen_gsheets(day, d, rng),
        }
        y, m, dd = day.split("-")
        for source, raws in per_source.items():
            path = ROOT / source / y / m / dd / "batch.json"
            path.parent.mkdir(parents=True, exist_ok=True)
            with path.open("w") as f:
                for off, raw in enumerate(raws):
                    f.write(
                        json.dumps(
                            envelope(source, day, off, raw, rng), separators=(",", ":")
                        )
                        + "\n"
                    )
            n_files += 1
            n_rows += len(raws)
    print(f"wrote {n_files} files, {n_rows} rows under {ROOT}")


if __name__ == "__main__":
    main()
