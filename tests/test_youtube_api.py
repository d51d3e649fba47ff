"""Offline tests for the YouTube API source via a fake transport."""

from __future__ import annotations

import pytest

from data_frame_demo_etl_spark.sources.youtube_api import (
    YouTubeAuthError,
    fetch_videos_df,
    pick_thumbnail,
    playlist_video_ids,
    resolve_api_key,
    uploads_playlist_id,
)


def fake_transport(endpoint: str, params: dict) -> dict:
    if endpoint == "channels":
        return {"items": [{"contentDetails": {"relatedPlaylists": {"uploads": "UPL1"}}}]}
    if endpoint == "playlistItems":
        page = params.get("pageToken")
        if page is None:
            return {
                "items": [{"contentDetails": {"videoId": f"v{i}"}} for i in range(2)],
                "nextPageToken": "p2",
            }
        return {"items": [{"contentDetails": {"videoId": "v2"}}]}
    if endpoint == "videos":
        ids = params["id"].split(",")
        return {
            "items": [
                {
                    "id": vid,
                    "snippet": {
                        "title": f"T {vid}",
                        "channelId": "c1",
                        "channelTitle": "Chan",
                        "publishedAt": "2024-05-01T00:00:00Z",
                        "tags": ["a", "b"],
                        "thumbnails": {"high": {"url": f"http://t/{vid}"}},
                    },
                    "contentDetails": {"duration": "PT1M30S"},
                    "statistics": {"viewCount": "100", "likeCount": "10", "commentCount": "2"},
                }
                for vid in ids
            ]
        }
    raise AssertionError(endpoint)


def test_resolve_api_key_missing(monkeypatch):
    monkeypatch.delenv("YOUTUBE_API_KEY", raising=False)
    with pytest.raises(YouTubeAuthError):
        resolve_api_key(None)
    assert resolve_api_key("k") == "k"


def test_pagination_and_channel_resolution():
    assert uploads_playlist_id("UC1", fake_transport) == "UPL1"
    ids = playlist_video_ids("UPL1", 10, fake_transport)
    assert ids == ["v0", "v1", "v2"]
    assert playlist_video_ids("UPL1", 2, fake_transport) == ["v0", "v1"]


def test_pick_thumbnail_preference():
    assert (
        pick_thumbnail({"thumbnails": {"default": {"url": "d"}, "high": {"url": "h"}}}) == "h"
    )
    assert pick_thumbnail({}) is None


def test_fetch_videos_df(spark):
    df = fetch_videos_df(spark, channel_id="UC1", max_results=5, transport=fake_transport)
    rows = {r.video_id: r for r in df.collect()}
    assert set(rows) == {"v0", "v1", "v2"}
    r = rows["v0"]
    assert r.duration_seconds == 90
    assert r.engagement_rate == pytest.approx(0.12)
    assert r.thumbnail_url == "http://t/v0"
    assert r.tags == "a, b"
