from elasticsearch_assets_ray.query.parser import parse_query


def test_plain_terms():
    q = parse_query("import parse config")
    assert q.should == ["import", "parse", "config"]
    assert q.must == [] and q.must_not == []
    assert q.scoring_terms == ["config", "import", "parse"]


def test_must_and_not():
    q = parse_query("+error -java throw")
    assert q.must == ["error"]
    assert q.must_not == ["java"]
    assert q.should == ["throw"]
    assert q.scoring_terms == ["error", "throw"]


def test_quoted_and_analysis():
    q = parse_query('+fooBar "read the File" -snake_case')
    # clause text runs through the same analyzer as indexing; a quoted
    # multi-term clause is a PHRASE whose terms become MUST
    assert q.phrases == [("read", "the", "file")]
    assert q.must == ["foo", "bar", "read", "the", "file"]
    assert q.should == []
    assert q.must_not == ["snake", "case"]


def test_to_string_canonical():
    q = parse_query("zebra -java +error +apple zebra")
    assert q.to_string() == "+apple +error -java zebra"


def test_empty_and_junk():
    assert parse_query("").scoring_terms == []
    assert parse_query("   !!! ").scoring_terms == []
