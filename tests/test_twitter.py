"""twitter_search input (operators/twitter.py — the reference ships it
as a template over http_client) + input-level `processors` support.
The mini server enforces the OAuth2 client-credentials flow and
since_id pagination."""

from __future__ import annotations

import json

import pytest

from benthos_spark.operators.cache import MemoryCache
from benthos_spark.operators.twitter import (MiniTwitterServer,
                                             TwitterSearchSource,
                                             fetch_token)


@pytest.fixture()
def tw():
    srv = MiniTwitterServer().start()
    yield srv
    srv.stop()


def test_oauth2_flow(tw):
    assert fetch_token(tw.endpoint, tw.api_key, tw.api_secret) == tw.token
    with pytest.raises(Exception):
        fetch_token(tw.endpoint, tw.api_key, "wrong")


def test_search_since_id_pagination(tw, spark):
    tw.tweet("benthos is neat")
    tw.tweet("unrelated noise")
    tw.tweet("more benthos content")
    cache = MemoryCache()
    src = TwitterSearchSource(
        api_url=tw.endpoint, query="benthos", cache=cache,
        api_key=tw.api_key, api_secret=tw.api_secret,
        tweet_fields=["lang"])
    out = [json.loads(r.value) for r in src.read(spark).collect()]
    assert [t["text"] for t in out] == ["benthos is neat",
                                       "more benthos content"]
    # the cursor landed in the cache: next poll sees only NEW tweets
    assert cache.get("last_tweet_id") == "3"
    tw.tweet("benthos again")
    out2 = [json.loads(r.value) for r in src.read(spark).collect()]
    assert [t["text"] for t in out2] == ["benthos again"]


def test_config_wiring_and_input_processors(tw, spark):
    from benthos_spark.config import compile_config

    tw.tweet("benthos hello world")
    conf = {
        "input": {
            "twitter_search": {
                "api_url": tw.endpoint, "query": "benthos",
                "cache": "tweetcache",
                "api_key": tw.api_key, "api_secret": tw.api_secret,
            },
            # input-level processors (input.WithPipeline parity)
            "processors": [
                {"mapping": 'root.text = this.text.uppercase()'},
            ],
        },
        "output": {"drop": {}},
        "cache_resources": [{"label": "tweetcache", "memory": {}}],
    }
    pipe, _ = compile_config(conf)
    out = pipe.run_batch(spark)
    assert [json.loads(r.value)["text"] for r in out.collect()] == \
        ["BENTHOS HELLO WORLD"]


def test_input_processors_on_plain_source(spark):
    from benthos_spark.config import compile_config

    conf = {
        "input": {
            "generate": {"count": 4, "streaming": False,
                         "mapping": {"v": "value"}},
            "processors": [{"filter": "v % 2 = 0"}],
        },
        "output": {"drop": {}},
    }
    pipe, _ = compile_config(conf)
    assert pipe.run_batch(spark).count() == 2
