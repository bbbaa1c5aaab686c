"""Recursive-descent parser producing the AST.

Structure mirrors /root/reference/src/parser/parser.go:94-361:
parse -> parseStatement -> (location, '.', object type, '{', filters, '}').
Operator precedence comes from the same recursion shape: after an expression,
``AND`` takes ONE following expression (exit recursion, parser.go:287-294)
while ``OR`` takes the whole rest (enter recursion, :295-305) — so AND binds
tighter and is left-nested, OR right-nested. Negation is only legal before
'(' or 'this' (parser.go:368-377).

The reference's parse-time dictionary binding + next-lower-value rewrite
(parser.go:412-444) is intentionally ABSENT: it exists only because the Go
engine compares dictionary positions; our planner compares tag values
directly under the same natural order, which is equivalent (see
functions/natural_sort.py and tests/test_natural_sort.py).
"""

from __future__ import annotations

from simple_osm_queries_spark.query import ast
from simple_osm_queries_spark.query.lexer import Token, TokenKind, tokenize


class ParseError(ValueError):
    pass


_BIN_OPS = ("=", "!=", ">", ">=", "<", "<=")


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.i = 0

    # --- token helpers ------------------------------------------------------
    def peek(self) -> Token | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self, expected: str = "token") -> Token:
        tok = self.peek()
        if tok is None:
            raise ParseError(f"Unexpected end of query, expected {expected}")
        self.i += 1
        return tok

    def expect(self, kind: TokenKind) -> Token:
        tok = self.next(kind.value)
        if tok.kind != kind:
            raise ParseError(
                f"Expected {kind.value!r} but found {tok.lexeme!r} at position {tok.pos}"
            )
        return tok

    # --- grammar -------------------------------------------------------------
    def parse_query(self) -> ast.Query:
        statements = []
        while self.peek() is not None:
            stmt = self.parse_statement(top_level=True)
            statements.append(stmt)
        if not statements:
            raise ParseError("Empty query")
        return ast.Query(tuple(statements))

    def parse_statement(self, top_level: bool) -> ast.Statement:
        tok = self.next("location expression")
        if tok.kind != TokenKind.KEYWORD:
            raise ParseError(f"Expected location expression at position {tok.pos}")
        if tok.lexeme == "bbox":
            location: ast.Location = self.parse_bbox_args()
            context_aware = False
        elif tok.lexeme == "this":
            if top_level:
                raise ParseError(
                    f"'this' location is only valid in sub-statements (position {tok.pos})"
                )
            location = ast.ContextAware()
            context_aware = True
        else:
            raise ParseError(
                f"Unknown location expression {tok.lexeme!r} at position {tok.pos}"
            )

        self.expect(TokenKind.DOT)
        type_tok = self.expect(TokenKind.KEYWORD)
        if type_tok.lexeme not in ast.QUERY_TYPES:
            raise ParseError(
                f"Unknown object type {type_tok.lexeme!r} at position {type_tok.pos}"
            )
        if type_tok.lexeme == "child_relations" and not context_aware:
            # parser.go:258-263 / parser_test.go:168-203
            raise ParseError(
                "'child_relations' is only valid in context-aware (this.*) statements"
            )
        self.expect(TokenKind.OPEN_BRACE)
        filt = self.parse_filter_expressions()
        self.expect(TokenKind.CLOSE_BRACE)
        return ast.Statement(location, type_tok.lexeme, filt)

    def parse_bbox_args(self) -> ast.Bbox:
        self.expect(TokenKind.OPEN_PAREN)
        coords = []
        for _ in range(4):
            tok = self.next("number in bbox()")
            if tok.kind != TokenKind.NUMBER:
                raise ParseError(
                    f"Expected number in bbox() but found {tok.lexeme!r} at position {tok.pos}"
                )
            try:
                coords.append(float(tok.lexeme))
            except ValueError:
                raise ParseError(f"Invalid number {tok.lexeme!r} at position {tok.pos}")
        self.expect(TokenKind.CLOSE_PAREN)
        return ast.Bbox(*coords)

    def parse_filter_expressions(self) -> ast.FilterExpr:
        """parseNextFilterExpressions (parser.go:267-313): expr (AND expr | OR rest)*"""
        expr = self.parse_next_expression()
        while True:
            tok = self.peek()
            if tok is None or tok.kind in (TokenKind.CLOSE_BRACE, TokenKind.CLOSE_PAREN):
                return expr
            if tok.kind != TokenKind.KEYWORD or tok.lexeme not in ("AND", "OR"):
                raise ParseError(
                    f"Expected 'AND', 'OR', '}}' or ')' but found {tok.lexeme!r} at position {tok.pos}"
                )
            self.i += 1
            if tok.lexeme == "AND":
                expr = ast.And(expr, self.parse_next_expression())
            else:
                return ast.Or(expr, self.parse_filter_expressions())

    def parse_next_expression(self) -> ast.FilterExpr:
        tok = self.next("expression")
        if tok.kind == TokenKind.OPEN_PAREN:
            expr = self.parse_filter_expressions()
            self.expect(TokenKind.CLOSE_PAREN)
            return expr
        if tok.kind == TokenKind.OPERATOR:
            if tok.lexeme != "!":
                raise ParseError(
                    f"Expected '!' to start an expression at position {tok.pos}"
                )
            nxt = self.peek()
            if nxt is None or not (
                nxt.kind == TokenKind.OPEN_PAREN
                or (nxt.kind == TokenKind.KEYWORD and nxt.lexeme == "this")
            ):
                raise ParseError(
                    f"Expected '(' or 'this' after '!' at position {tok.pos}"
                )
            return ast.Not(self.parse_next_expression())
        if tok.kind == TokenKind.KEYWORD:
            if tok.lexeme == "this":
                # `this.buffer(5m).ways{...}` (README.md:154-181; the
                # reference documents this form but never implemented it)
                nxt2 = self.tokens[self.i + 1] if self.i + 1 < len(self.tokens) else None
                if (
                    self.peek() is not None
                    and self.peek().kind == TokenKind.DOT
                    and nxt2 is not None
                    and nxt2.kind == TokenKind.KEYWORD
                    and nxt2.lexeme == "buffer"
                ):
                    self.i += 2  # consume '.' 'buffer'
                    buffer_m = self.parse_buffer_args()
                    # remainder parses like a context-aware statement body:
                    # '.' <type> '{' filter '}'
                    self.expect(TokenKind.DOT)
                    type_tok = self.expect(TokenKind.KEYWORD)
                    if type_tok.lexeme not in ast.QUERY_TYPES:
                        raise ParseError(
                            f"Unknown object type {type_tok.lexeme!r} at position {type_tok.pos}"
                        )
                    self.expect(TokenKind.OPEN_BRACE)
                    filt = self.parse_filter_expressions()
                    self.expect(TokenKind.CLOSE_BRACE)
                    stmt = ast.Statement(ast.ContextAware(), type_tok.lexeme, filt)
                    return ast.SubStatement(stmt, buffer_m=buffer_m)
                self.i -= 1  # parse_statement re-reads the 'this' token
                return ast.SubStatement(self.parse_statement(top_level=False))
            return self.parse_normal_expression(tok)
        raise ParseError(f"Unexpected token {tok.lexeme!r} at position {tok.pos}")

    def parse_buffer_args(self) -> float:
        """`(5m)` / `(5.5 m)` / `(250)` — number + optional unit keyword.
        Units: m (default) and km; the lexer splits `5m` into NUMBER+KEYWORD."""
        self.expect(TokenKind.OPEN_PAREN)
        num_tok = self.next("buffer distance")
        if num_tok.kind != TokenKind.NUMBER:
            raise ParseError(
                f"Expected a number in buffer() at position {num_tok.pos}"
            )
        try:
            value = float(num_tok.lexeme)
        except ValueError:
            raise ParseError(f"Invalid number {num_tok.lexeme!r} at position {num_tok.pos}")
        unit_tok = self.peek()
        if unit_tok is not None and unit_tok.kind == TokenKind.KEYWORD:
            self.i += 1
            if unit_tok.lexeme == "m":
                pass
            elif unit_tok.lexeme == "km":
                value *= 1000.0
            else:
                raise ParseError(
                    f"Unknown buffer unit {unit_tok.lexeme!r} at position {unit_tok.pos}"
                )
        self.expect(TokenKind.CLOSE_PAREN)
        if value <= 0:
            raise ParseError("buffer() distance must be positive")
        return value

    def parse_normal_expression(self, key_tok: Token) -> ast.FilterExpr:
        op_tok = self.next("binary operator")
        if op_tok.kind != TokenKind.OPERATOR or op_tok.lexeme not in _BIN_OPS:
            raise ParseError(
                f"Expected binary operator after {key_tok.lexeme!r} at position {op_tok.pos}"
            )
        val_tok = self.next("value")
        if val_tok.kind == TokenKind.WILDCARD:
            if op_tok.lexeme not in ("=", "!="):
                raise ParseError(
                    f"Wildcard '*' requires '=' or '!=' (position {val_tok.pos})"
                )
            return ast.KeyFilter(key_tok.lexeme, present=op_tok.lexeme == "=")
        if val_tok.kind not in (TokenKind.KEYWORD, TokenKind.NUMBER):
            raise ParseError(
                f"Expected value after {key_tok.lexeme}{op_tok.lexeme} at position {val_tok.pos}"
            )
        return ast.TagFilter(key_tok.lexeme, op_tok.lexeme, val_tok.lexeme)


def parse_query(text: str) -> ast.Query:
    return _Parser(tokenize(text)).parse_query()
