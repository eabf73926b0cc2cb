"""`twitter_search` input (internal/impl/twitter/
template_search_input.yaml — the reference ships it as a template over
http_client + cache): polls the Twitter recent-search v2 API for
tweets matching a query, paginating with ``since_id`` stored in a
cache resource so a restart resumes after the last tweet consumed —
the template's exact pagination contract. Authentication is the
published OAuth 2.0 client-credentials flow (POST ``/oauth2/token``
with Basic auth -> bearer token).

Each tweet is one JSON document with ``id`` and ``text`` (plus any
``tweet_fields`` requested), like the template's output. On first run
(empty cache) the search is bounded by ``backfill_period_s`` via
``start_time``. The id axis is a replayable cursor — with a persistent
cache the input is effectively at-least-once into the sink ledger's
exactly-once upgrade, same as the template's recommendation to use a
persistent cache."""

from __future__ import annotations

import base64
import datetime
import json
import threading
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.operators.cache import Cache
from benthos_spark.sources.readers import Source


def fetch_token(api_url: str, api_key: str, api_secret: str) -> str:
    """OAuth2 client-credentials: Basic auth -> access token."""
    basic = base64.b64encode(f"{api_key}:{api_secret}".encode()).decode()
    req = urllib.request.Request(
        f"{api_url}/oauth2/token", data=b"grant_type=client_credentials",
        headers={"Authorization": f"Basic {basic}",
                 "Content-Type": "application/x-www-form-urlencoded"},
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())["access_token"]


@dataclass
class TwitterSearchSource(Source):
    api_url: str = "https://api.twitter.com"
    query: str = ""
    tweet_fields: Sequence[str] = ()
    backfill_period_s: int = 300
    cache: Optional[Cache] = None
    cache_key: str = "last_tweet_id"
    api_key: str = ""
    api_secret: str = ""
    poll_period_s: float = 0.2
    spool_dir: str = ""
    streaming: bool = False
    _thread: object = field(default=None, repr=False)
    _stop: object = field(default=None, repr=False)

    def __post_init__(self):
        if not self.query:
            raise ValueError("twitter_search needs a query")
        if self.cache is None:
            raise ValueError("twitter_search needs a cache resource "
                             "(the since_id pagination store)")

    def _search(self, token: str) -> list[dict]:
        params = {"query": self.query, "max_results": "100"}
        if self.tweet_fields:
            params["tweet.fields"] = ",".join(self.tweet_fields)
        last = self.cache.get(self.cache_key)
        if last:
            params["since_id"] = str(last)
        else:
            start = (datetime.datetime.now(datetime.timezone.utc)
                     - datetime.timedelta(seconds=self.backfill_period_s))
            params["start_time"] = start.strftime("%Y-%m-%dT%H:%M:%SZ")
        url = (f"{self.api_url}/2/tweets/search/recent?"
               + urllib.parse.urlencode(params))
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {token}"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            doc = json.loads(resp.read())
        tweets = doc.get("data") or []
        if tweets:
            self.cache.set(self.cache_key,
                           str(max(int(t["id"]) for t in tweets)))
        return tweets

    def read(self, spark: SparkSession) -> DataFrame:
        token = fetch_token(self.api_url, self.api_key, self.api_secret)
        if not self.streaming:
            rows = []
            while True:
                tweets = self._search(token)
                if not tweets:
                    break
                rows.extend((json.dumps(t, sort_keys=True),) for t in tweets)
            return spark.createDataFrame(rows, "value string")
        if not self.spool_dir:
            raise ValueError("streaming twitter_search needs a spool_dir")
        import os

        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            spool, period = self.spool_dir, self.poll_period_s

            def loop():
                while not stop.is_set():
                    tweets = self._search(token)
                    if tweets:
                        _spool_write(spool, b"".join(
                            json.dumps(t, sort_keys=True).encode() + b"\n"
                            for t in tweets))
                    else:
                        time.sleep(period)

            self._stop = stop
            t = threading.Thread(target=loop, daemon=True)
            t.start()
            self._thread = t
        return (spark.readStream.format("text")
                .schema("value string").load(self.spool_dir))

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
            self._thread.join(timeout=5)


class MiniTwitterServer:
    """Recent-search v2 loopback: OAuth2 token endpoint + since_id /
    start_time filtered search over injected tweets."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 api_key: str = "key", api_secret: str = "secret"):
        self.host, self.port = host, port
        self.api_key, self.api_secret = api_key, api_secret
        self.tweets: list[dict] = []
        self.token = "tok-" + api_key
        self._lock = threading.Lock()
        self._seq = 0

    def tweet(self, text: str, **extra) -> dict:
        with self._lock:
            self._seq += 1
            t = {"id": str(self._seq), "text": text, **extra}
            self.tweets.append(t)
            return t

    def start(self) -> "MiniTwitterServer":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, status: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if urllib.parse.urlparse(self.path).path != "/oauth2/token":
                    self._reply(404, {})
                    return
                basic = base64.b64encode(
                    f"{outer.api_key}:{outer.api_secret}".encode()).decode()
                if self.headers.get("Authorization") != f"Basic {basic}":
                    self._reply(403, {"errors": [{"message": "invalid creds"}]})
                    return
                self._reply(200, {"access_token": outer.token,
                                  "token_type": "bearer"})

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path != "/2/tweets/search/recent":
                    self._reply(404, {})
                    return
                if self.headers.get("Authorization") != f"Bearer {outer.token}":
                    self._reply(401, {"title": "Unauthorized"})
                    return
                q = dict(urllib.parse.parse_qsl(parsed.query))
                since = int(q.get("since_id", "0"))
                needle = q.get("query", "")
                fields = ["id", "text"] + [
                    f for f in q.get("tweet.fields", "").split(",") if f]
                with outer._lock:
                    hits = [
                        {k: t[k] for k in fields if k in t}
                        for t in outer.tweets
                        if int(t["id"]) > since and needle in t["text"]]
                self._reply(200, {"data": hits,
                                  "meta": {"result_count": len(hits)}})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"
