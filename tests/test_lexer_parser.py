"""Lexer + parser tests mirroring /root/reference/src/parser/lexer_test.go and
parser_test.go (grammar, precedence, error cases)."""

import pytest

from simple_osm_queries_spark.query import ast
from simple_osm_queries_spark.query.lexer import LexError, TokenKind, tokenize
from simple_osm_queries_spark.query.parser import ParseError, parse_query


# --- lexer -------------------------------------------------------------------


def test_tokenize_simple_statement():
    toks = tokenize("bbox(1,2,3,4).nodes{ amenity=bench }")
    kinds = [t.kind for t in toks]
    assert kinds == [
        TokenKind.KEYWORD, TokenKind.OPEN_PAREN, TokenKind.NUMBER, TokenKind.NUMBER,
        TokenKind.NUMBER, TokenKind.NUMBER, TokenKind.CLOSE_PAREN, TokenKind.DOT,
        TokenKind.KEYWORD, TokenKind.OPEN_BRACE, TokenKind.KEYWORD, TokenKind.OPERATOR,
        TokenKind.KEYWORD, TokenKind.CLOSE_BRACE,
    ]
    assert toks[2].lexeme == "1"
    assert toks[11].lexeme == "="


@pytest.mark.parametrize("op", ["=", "!=", "<", "<=", ">", ">=", "!"])
def test_tokenize_operators(op):
    toks = tokenize(f"a{op}b" if op != "!" else "!(a=b)")
    assert any(t.kind == TokenKind.OPERATOR and t.lexeme == op for t in toks)


def test_tokenize_decimal_numbers_and_commas():
    toks = tokenize("bbox(1.5, 2.25, 3.0, 4)")
    nums = [t.lexeme for t in toks if t.kind == TokenKind.NUMBER]
    assert nums == ["1.5", "2.25", "3.0", "4"]


def test_tokenize_wildcard_and_colon_keys():
    toks = tokenize("addr:housenumber=*")
    assert toks[0].kind == TokenKind.KEYWORD and toks[0].lexeme == "addr:housenumber"
    assert toks[2].kind == TokenKind.WILDCARD


def test_tokenize_comments():
    toks = tokenize("// leading comment\nnodes // trailing\n{")
    assert [t.lexeme for t in toks] == ["nodes", "{"]


def test_tokenize_error_on_stray_char():
    with pytest.raises(LexError):
        tokenize("a = b; c")
    with pytest.raises(LexError):
        tokenize("a / b")


# --- parser ------------------------------------------------------------------


def _stmt(q: str) -> ast.Statement:
    return parse_query(q).statements[0]


def test_parse_bbox_statement():
    s = _stmt("bbox(1,2,3,4).nodes{ natural=tree }")
    assert s.location == ast.Bbox(1.0, 2.0, 3.0, 4.0)
    assert s.query_type == "nodes"
    assert s.filter == ast.TagFilter("natural", "=", "tree")


@pytest.mark.parametrize("qt", ["nodes", "ways", "relations"])
def test_parse_object_types(qt):
    assert _stmt(f"bbox(1,2,3,4).{qt}{{ a=b }}").query_type == qt


def test_child_relations_only_context_aware():
    # parser_test.go:168-203
    with pytest.raises(ParseError):
        parse_query("bbox(1,2,3,4).child_relations{ a=b }")
    s = _stmt("bbox(1,2,3,4).relations{ this.child_relations{ a=b } }")
    assert isinstance(s.filter, ast.SubStatement)
    assert s.filter.statement.query_type == "child_relations"


def test_this_invalid_at_top_level():
    with pytest.raises(ParseError):
        parse_query("this.nodes{ a=b }")


def test_and_binds_tighter_than_or():
    # a AND b OR c  =>  Or(And(a,b), c)   (parser.go:287-305)
    f = _stmt("bbox(1,2,3,4).nodes{ a=1 AND b=2 OR c=3 }").filter
    assert isinstance(f, ast.Or)
    assert isinstance(f.a, ast.And)
    # a OR b AND c  =>  Or(a, And(b,c))
    f = _stmt("bbox(1,2,3,4).nodes{ a=1 OR b=2 AND c=3 }").filter
    assert isinstance(f, ast.Or)
    assert isinstance(f.b, ast.And)


def test_parenthesized_expressions():
    f = _stmt("bbox(1,2,3,4).nodes{ (a=1 OR b=2) AND c=3 }").filter
    assert isinstance(f, ast.And)
    assert isinstance(f.a, ast.Or)


def test_wildcard_filters():
    f = _stmt("bbox(1,2,3,4).nodes{ seats=* }").filter
    assert f == ast.KeyFilter("seats", present=True)
    f = _stmt("bbox(1,2,3,4).nodes{ seats!=* }").filter
    assert f == ast.KeyFilter("seats", present=False)
    with pytest.raises(ParseError):
        parse_query("bbox(1,2,3,4).nodes{ seats>=* }")


def test_negation_rules():
    # negation only before '(' or 'this' (parser.go:368-377)
    f = _stmt("bbox(1,2,3,4).nodes{ !(a=1) }").filter
    assert isinstance(f, ast.Not)
    f = _stmt("bbox(1,2,3,4).nodes{ !this.ways{ a=1 } }").filter
    assert isinstance(f, ast.Not) and isinstance(f.expr, ast.SubStatement)
    with pytest.raises(ParseError):
        parse_query("bbox(1,2,3,4).nodes{ !a=1 }")


def test_nested_substatements():
    # parser_test.go:276-312
    q = """
    bbox(1,2,3,4).ways{
      (railway=rail OR railway=light_rail) AND
      this.nodes{ this.ways{ railway=rail } }
    }
    """
    s = _stmt(q)
    assert isinstance(s.filter, ast.And)
    sub = s.filter.b
    assert isinstance(sub, ast.SubStatement)
    inner = sub.statement.filter
    assert isinstance(inner, ast.SubStatement)
    assert inner.statement.query_type == "ways"


def test_buffer_substatement():
    f = _stmt("bbox(1,2,3,4).nodes{ this.buffer(5m).ways{ highway=* } }").filter
    assert isinstance(f, ast.SubStatement) and f.buffer_m == 5.0
    assert f.statement.query_type == "ways"
    f = _stmt("bbox(1,2,3,4).nodes{ this.buffer(2km).ways{ a=b } }").filter
    assert f.buffer_m == 2000.0
    f = _stmt("bbox(1,2,3,4).nodes{ this.buffer(250).ways{ a=b } }").filter
    assert f.buffer_m == 250.0  # bare number defaults to meters
    f = _stmt("bbox(1,2,3,4).nodes{ !this.buffer(5m).ways{ a=b } }").filter
    assert isinstance(f, ast.Not) and f.expr.buffer_m == 5.0
    for bad in [
        "bbox(1,2,3,4).nodes{ this.buffer(5ft).ways{ a=b } }",
        "bbox(1,2,3,4).nodes{ this.buffer(m).ways{ a=b } }",
        "bbox(1,2,3,4).nodes{ this.buffer(5m).trees{ a=b } }",
    ]:
        with pytest.raises(ParseError):
            parse_query(bad)


def test_multiple_top_level_statements():
    q = parse_query("bbox(1,2,3,4).nodes{ a=1 }\nbbox(5,6,7,8).ways{ b=2 }")
    assert len(q.statements) == 2
    assert q.statements[1].query_type == "ways"


def test_numeric_values_and_comparisons():
    f = _stmt("bbox(1,2,3,4).nodes{ width>=2.5 }").filter
    assert f == ast.TagFilter("width", ">=", "2.5")


def test_parse_errors():
    for bad in [
        "bbox(1,2,3).nodes{ a=1 }",       # 3 coords
        "bbox(1,2,3,4).trees{ a=1 }",     # unknown type
        "bbox(1,2,3,4).nodes{ a=1",       # missing }
        "bbox(1,2,3,4).nodes{ a 1 }",     # missing operator
        "bbox(1,2,3,4).nodes{ }",         # empty filter
        "bbox(1,2,3,4).nodes{ a=1 XOR b=2 }",
    ]:
        with pytest.raises(ParseError):
            parse_query(bad)
