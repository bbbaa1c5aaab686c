"""Lexer for the query language.

Token rules mirror /root/reference/src/parser/lexer.go:
* whitespace and ',' are separators (lexer.go:72-74);
* ``//`` comments run to end of line (lexer.go:77-83, 140-158);
* keywords are runs of [A-Za-z_:@] (keywordChars, lexer.go:17-20);
* numbers are runs of [0-9.] (numberChars, lexer.go:21; sign handled by the
  operator '-'? No — the reference lexes negative bbox numbers via the number
  charset only, so we add '-' as a number-starting char when it precedes a
  digit, matching parser behavior on ParseFloat; the reference itself cannot
  lex '-' — bbox coordinates in its tests are non-negative — we accept it as
  a strict superset);
* operators: ! != < <= > >= =  (lexer.go:110-133);
* single-char tokens: ( ) { } . *
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class TokenKind(Enum):
    KEYWORD = "keyword"
    NUMBER = "number"
    OPERATOR = "operator"
    OPEN_PAREN = "("
    CLOSE_PAREN = ")"
    OPEN_BRACE = "{"
    CLOSE_BRACE = "}"
    DOT = "."
    WILDCARD = "*"


@dataclass(frozen=True)
class Token:
    kind: TokenKind
    lexeme: str
    pos: int


class LexError(ValueError):
    pass


_KEYWORD_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_:@")
_NUMBER_CHARS = set("1234567890.")
_SINGLE = {
    "(": TokenKind.OPEN_PAREN,
    ")": TokenKind.CLOSE_PAREN,
    "{": TokenKind.OPEN_BRACE,
    "}": TokenKind.CLOSE_BRACE,
    "*": TokenKind.WILDCARD,
    # '.' at token start is ALWAYS the expression separator (lexer.go:85-99
    # checks single-char tokens before the number charset), so numbers cannot
    # start with a bare '.', exactly like the reference.
    ".": TokenKind.DOT,
}


def tokenize(text: str) -> list[Token]:
    text = text.strip("\n\r\t ")
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace() or c == ",":
            i += 1
            continue
        if c == "/":
            if i + 1 >= n or text[i + 1] != "/":
                raise LexError(f"Unexpected '/' at index {i}")
            while i < n and text[i] not in "\n\r":
                i += 1
            continue
        if c in _SINGLE:
            tokens.append(Token(_SINGLE[c], c, i))
            i += 1
            continue
        if c in _KEYWORD_CHARS:
            j = i
            while j < n and text[j] in _KEYWORD_CHARS:
                j += 1
            tokens.append(Token(TokenKind.KEYWORD, text[i:j], i))
            i = j
            continue
        if c in _NUMBER_CHARS or (c == "-" and i + 1 < n and text[i + 1] in _NUMBER_CHARS):
            j = i + 1
            while j < n and text[j] in _NUMBER_CHARS:
                j += 1
            tokens.append(Token(TokenKind.NUMBER, text[i:j], i))
            i = j
            continue
        if c in "!<>":
            if i + 1 < n and text[i + 1] == "=":
                tokens.append(Token(TokenKind.OPERATOR, text[i : i + 2], i))
                i += 2
            else:
                tokens.append(Token(TokenKind.OPERATOR, c, i))
                i += 1
            continue
        if c == "=":
            tokens.append(Token(TokenKind.OPERATOR, "=", i))
            i += 1
            continue
        raise LexError(f"Unexpected character {c!r} at index {i}")
    return tokens
