"""YouTube Data API source → Spark DataFrame.

Parity with the reference client (reference src/youtube.py:148-208):
channel-uploads resolution, playlist pagination, 50-id batch detail
fetch, thumbnail preference order, tidy output schema — returning a
Spark DataFrame ready for the engagement analytics.

Network access is dependency-injected (``transport``): production
passes a requests-backed callable; tests pass a fake. The client runs
driver-side (the API is the bottleneck, volumes are tiny); the heavy
lifting downstream (summaries, joins) is distributed.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..analytics.engagement import add_engagement_metrics

API_BASE = "https://www.googleapis.com/youtube/v3"

OUTPUT_SCHEMA = (
    "video_id string, title string, description string, channel_id string, "
    "channel_title string, published_at string, duration string, "
    "view_count long, like_count long, comment_count long, tags string, "
    "thumbnail_url string, source string"
)

Transport = Callable[[str, dict], dict]


class YouTubeAuthError(RuntimeError):
    """Raised when no API key is available."""


def requests_transport(api_key: str) -> Transport:
    """Production transport (requires network + `requests`)."""
    import requests

    def call(endpoint: str, params: dict) -> dict:
        payload = dict(params or {})
        payload["key"] = api_key
        resp = requests.get(f"{API_BASE}/{endpoint}", params=payload, timeout=30)
        resp.raise_for_status()
        return resp.json()

    return call


def resolve_api_key(explicit: str | None = None) -> str:
    key = explicit or os.getenv("YOUTUBE_API_KEY")
    if not key:
        raise YouTubeAuthError(
            "Provide a YouTube Data API key (argument or YOUTUBE_API_KEY env var)."
        )
    return key


def _chunked(items: Iterable[str], size: int = 50) -> Iterator[list[str]]:
    bucket: list[str] = []
    for item in items:
        bucket.append(item)
        if len(bucket) >= size:
            yield bucket
            bucket = []
    if bucket:
        yield bucket


def uploads_playlist_id(channel_id: str, transport: Transport) -> str:
    data = transport("channels", {"part": "contentDetails", "id": channel_id, "maxResults": 1})
    items = data.get("items") or []
    if not items:
        raise ValueError(f"Channel {channel_id!r} not found.")
    return items[0]["contentDetails"]["relatedPlaylists"]["uploads"]


def playlist_video_ids(playlist_id: str, max_results: int, transport: Transport) -> list[str]:
    out: list[str] = []
    token = None
    while len(out) < max_results:
        data = transport(
            "playlistItems",
            {
                "part": "contentDetails",
                "playlistId": playlist_id,
                "maxResults": min(50, max_results - len(out)),
                "pageToken": token,
            },
        )
        for item in data.get("items", []):
            vid = item.get("contentDetails", {}).get("videoId")
            if vid:
                out.append(vid)
        token = data.get("nextPageToken")
        if not token:
            break
    return out[:max_results]


def pick_thumbnail(snippet: dict) -> str | None:
    thumbs = snippet.get("thumbnails") or {}
    for key in ("standard", "high", "medium", "default"):
        if isinstance(thumbs.get(key), dict):
            return thumbs[key].get("url")
    return None


def video_records(
    video_ids: list[str], transport: Transport, source: str = ""
) -> list[dict]:
    records: list[dict] = []
    for chunk in _chunked(video_ids):
        data = transport(
            "videos",
            {"part": "snippet,contentDetails,statistics", "id": ",".join(chunk), "maxResults": len(chunk)},
        )
        for item in data.get("items", []):
            snippet = item.get("snippet", {}) or {}
            stats = item.get("statistics", {}) or {}
            content = item.get("contentDetails", {}) or {}
            records.append(
                {
                    "video_id": item.get("id"),
                    "title": snippet.get("title"),
                    "description": snippet.get("description"),
                    "channel_id": snippet.get("channelId"),
                    "channel_title": snippet.get("channelTitle"),
                    "published_at": snippet.get("publishedAt"),
                    "duration": content.get("duration"),
                    "view_count": int(stats.get("viewCount", 0) or 0),
                    "like_count": int(stats.get("likeCount", 0) or 0),
                    "comment_count": int(stats.get("commentCount", 0) or 0),
                    "tags": ", ".join(snippet.get("tags", []) or []),
                    "thumbnail_url": pick_thumbnail(snippet),
                    "source": source,
                }
            )
    return records


def fetch_videos_df(
    spark: SparkSession,
    *,
    channel_id: str | None = None,
    playlist_id: str | None = None,
    max_results: int = 25,
    api_key: str | None = None,
    transport: Transport | None = None,
) -> DataFrame:
    """Fetch channel uploads / playlist items into a Spark DataFrame
    with engagement metrics and ISO-duration seconds attached."""
    from pyspark.sql import functions as F

    from ..analytics.engagement import iso8601_duration_seconds

    if transport is None:
        transport = requests_transport(resolve_api_key(api_key))

    target = playlist_id or (
        uploads_playlist_id(channel_id, transport) if channel_id else None
    )
    if not target:
        raise ValueError("Provide a channel_id or playlist_id.")

    ids = playlist_video_ids(target, max(1, max_results), transport)
    records = video_records(ids, transport, source=playlist_id or channel_id or "")
    df = spark.createDataFrame(records, OUTPUT_SCHEMA) if records else spark.createDataFrame([], OUTPUT_SCHEMA)
    df = df.withColumn("duration_seconds", iso8601_duration_seconds(F.col("duration")))
    return add_engagement_metrics(df)
