"""RSS/Atom feed parsing (operators/feeds.py:parse_feeds)."""

from horus_spark.operators.feeds import parse_feeds

RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel>'
    "<title>Channel decoy</title><link>https://site.test/</link>"
    "<item><title>Post <b>one</b></title>"
    "<link> https://site.test/post/1 </link>"
    '<guid isPermaLink="false">tag-1</guid>'
    "<pubDate>2026-07-01</pubDate></item>"
    "<ITEM><title>No link, dropped</title><guid>tag-2</guid></ITEM>"
    "<item><link>https://site.test/post/3</link></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>Feed decoy</title>'
    '<entry><title>A1</title><link href="https://a.test/1" rel="alt"/>'
    "<id>urn:1</id><published>P1</published><updated>U1</updated></entry>"
    '<entry><title>A2</title><link rel="alt" href="https://a.test/2"/>'
    "<updated>U2</updated></entry>"
    "</feed>"
)


def _parse(spark, xml):
    df = spark.createDataFrame([("f", xml)], "src string, feed_xml string")
    return parse_feeds(df)


def test_rss_entries(spark):
    rows = {r["entry_pos"]: r.asDict() for r in _parse(spark, RSS).collect()}
    # entry 1 (no link) dropped; positions unshifted
    assert sorted(rows) == [0, 2]
    e0 = rows[0]
    assert e0["kind"] == "rss"
    assert e0["title"] == "Post one"  # markup stripped
    assert e0["link"] == "https://site.test/post/1"  # trimmed
    assert e0["guid"] == "tag-1"
    assert e0["published"] == "2026-07-01"
    e2 = rows[2]
    assert e2["title"] is None and e2["guid"] is None
    assert e2["link"] == "https://site.test/post/3"


def test_channel_chrome_not_an_entry(spark):
    # channel-level <title>/<link> live outside item blocks
    titles = [r["title"] for r in _parse(spark, RSS).collect()]
    assert "Channel decoy" not in titles


def test_atom_entries(spark):
    rows = {r["entry_pos"]: r.asDict() for r in _parse(spark, ATOM).collect()}
    e0, e1 = rows[0], rows[1]
    assert e0["kind"] == "atom"
    assert e0["link"] == "https://a.test/1"  # href-first attr order
    assert e1["link"] == "https://a.test/2"  # rel-first attr order
    assert e0["guid"] == "urn:1"
    assert e0["published"] == "P1"  # published wins over updated
    assert e1["published"] == "U2"  # fallback to updated
    assert e1["guid"] is None


def test_plan_shuffle_free(spark):
    df = spark.createDataFrame([("f", RSS)], "src string, feed_xml string")
    plan = parse_feeds(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_atom_single_quoted_href(spark):
    xml = (
        "<feed><entry><title>SQ</title>"
        "<link href='https://a.test/sq' rel='alternate'/>"
        "<id>urn:sq</id></entry></feed>"
    )
    rows = _parse(spark, xml).collect()
    assert len(rows) == 1 and rows[0]["link"] == "https://a.test/sq"
