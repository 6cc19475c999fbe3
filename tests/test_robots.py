"""RFC 9309 robots matcher: group selection, longest-match, wildcards,
anchors, tie-breaking — cases taken from the RFC's own examples."""

from crystal_html5_spark.sparkjob.robots import (
    allowed,
    is_allowed,
    parse_robots,
    rules_for,
)


def test_no_robots_allows_everything():
    assert is_allowed("", "bot", "/anything")


def test_empty_disallow_is_no_rule():
    assert is_allowed("User-agent: *\nDisallow:", "bot", "/x")


def test_prefix_disallow():
    txt = "User-agent: *\nDisallow: /p/"
    assert not is_allowed(txt, "bot", "/p/123")
    assert is_allowed(txt, "bot", "/q/123")
    assert is_allowed(txt, "bot", "/p")  # shorter than the pattern


def test_longer_allow_overrides_disallow():
    txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b/"
    assert not is_allowed(txt, "bot", "/a/x")
    assert is_allowed(txt, "bot", "/a/b/x")


def test_allow_wins_length_tie():
    txt = "User-agent: *\nDisallow: /page\nAllow: /page"
    assert is_allowed(txt, "bot", "/page.html")


def test_wildcard_and_end_anchor():
    txt = "User-agent: *\nDisallow: /*.gif$"
    assert not is_allowed(txt, "bot", "/pics/cat.gif")
    assert is_allowed(txt, "bot", "/pics/cat.gif?v=2")  # not at end
    txt2 = "User-agent: *\nDisallow: /fish$"
    assert not is_allowed(txt2, "bot", "/fish")
    assert is_allowed(txt2, "bot", "/fishing")


def test_rfc_example_group_specificity():
    # RFC 9309 §5.1-style: specific UA group beats *, groups merge
    txt = (
        "User-agent: ExampleBot\nDisallow: /private/\n\n"
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: examplebot\nDisallow: /tmp/\n"
    )
    groups = parse_robots(txt)
    rs = rules_for(groups, "ExampleBot")
    assert len(rs) == 2  # both ExampleBot groups merged, '*' ignored
    assert not allowed(rs, "/private/x")
    assert not allowed(rs, "/tmp/y")
    assert allowed(rs, "/public")
    # an unknown agent falls back to '*'
    assert not is_allowed(txt, "otherbot", "/anything")


def test_comments_and_unknown_keys_ignored():
    txt = (
        "# a comment\nSitemap: https://x/s.xml\n"
        "User-agent: * # trailing comment\nCrawl-delay: 10\n"
        "Disallow: /secret/\n"
    )
    assert not is_allowed(txt, "bot", "/secret/f")
    assert is_allowed(txt, "bot", "/open")


def test_case_insensitive_keys_and_agents():
    txt = "USER-AGENT: MyBot\nDISALLOW: /x/"
    assert not is_allowed(txt, "mybot", "/x/1")
    assert is_allowed(txt, "OtherBot", "/x/1")  # no '*' group at all


def test_mid_pattern_wildcard():
    txt = "User-agent: *\nDisallow: /a/*/c"
    assert not is_allowed(txt, "bot", "/a/b/c")
    assert not is_allowed(txt, "bot", "/a/bb/cc")
    assert is_allowed(txt, "bot", "/a/b")
