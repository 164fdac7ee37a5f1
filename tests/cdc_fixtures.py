"""Deterministic CDC fixture generators (FIXTURES.md §1, §2, §5)."""

from __future__ import annotations

import json
import os


def av(s: str) -> dict:
    return {"S": s}


def avn(n: str) -> dict:
    return {"N": n}


def member_item(uuid: str, name: str) -> dict:
    return {
        "Item": {
            "pk": av(f"M_{uuid}"),
            "sk": av(name),
            "memberId": av(uuid),
            "memberName": av(name),
        }
    }


def quest_item(uuid: str, name: str) -> dict:
    return {"Item": {"pk": av(f"Q_{uuid}"), "sk": av(name), "questId": av(uuid)}}


def member_quest_item(uuid: str, member_uuid: str, quest_uuid: str, dollars: str) -> dict:
    return {
        "Item": {
            "pk": av(f"MQ#M_{member_uuid}"),
            "sk": av(f"MQ_{uuid}"),
            "questId": av(quest_uuid),
            "dollarsEarned": avn(dollars),
        }
    }


def envelope(
    event_id: str,
    event_name: str,
    pk: str,
    sk: str,
    creation_ms: int,
    new_image: dict | None = None,
) -> dict:
    env = {
        "eventID": event_id,
        "awsRegion": "us-east-1",
        "eventName": event_name,
        "userIdentity": None,
        "tableName": "activity",
        "eventSource": "aws:dynamodb",
        "dynamodb": {
            "ApproximateCreationDateTime": creation_ms,
            "Keys": {"pk": av(pk), "sk": av(sk)},
        },
    }
    if new_image is not None:  # absent for REMOVE (FIXTURES.md §1)
        env["dynamodb"]["NewImage"] = new_image
    return env


def kinesis_record(seq: int, env: dict, arrival: str = "2023-11-15T00:00:00.000Z") -> dict:
    return {
        "approximate_arrival_timestamp": arrival,
        "partition_key": env["dynamodb"]["Keys"]["pk"]["S"],
        "shard_id": "shardId-000000000000",
        "sequence_number": str(seq).zfill(20),
        "kinesis_data": json.dumps(env),
    }


def write_jsonl(path: str, lines: list[dict]) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for line in lines:
            fh.write(json.dumps(line) + "\n")
    return path
