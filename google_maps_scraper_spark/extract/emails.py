"""Email harvesting from business-website pages.

Reproduces the reference's two-stage extraction (gmaps/emailjob.go:104-148):

  1. DOM pass: every ``a[href^='mailto:']`` anchor in document order, the
     address validated/normalized, order-preserving first-occurrence dedup;
  2. fallback regex scan over the raw body when the DOM pass found nothing —
     ``emailaddress.Find(body, false)`` semantics (RFC-5322-ish pattern, no
     ICANN TLD check; github.com/mcnijman/go-emailaddress, go.mod:24).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["extract_emails", "doc_email_extractor", "regex_email_extractor", "parse_email"]

# go-emailaddress validation patterns (published, RFC-5322-ish).
_LOCAL = r"[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+"
_DOMAIN = (
    r"[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?"
    r"(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)+"
)
_EMAIL_RE = re.compile(_LOCAL + "@" + _DOMAIN)
_EMAIL_FULL_RE = re.compile(r"^" + _LOCAL + "@" + _DOMAIN + r"$")


def parse_email(s: str) -> str | None:
    """Validate one address (emailaddress.Parse path); None when invalid."""
    s = s.strip()
    if "@" not in s:
        return None
    if _EMAIL_FULL_RE.match(s):
        return s
    return None


class _MailtoParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def _take(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag != "a":
            return
        href = dict(attrs).get("href") or ""
        if href.startswith("mailto:"):
            self.hrefs.append(href)

    def handle_starttag(self, tag, attrs):  # noqa: D102
        self._take(tag, attrs)

    def handle_startendtag(self, tag, attrs):  # noqa: D102
        self._take(tag, attrs)


def doc_email_extractor(html: str | bytes) -> list[str]:
    """gmaps/emailjob.go:104-123 — mailto anchors, validated, first-wins."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    p = _MailtoParser()
    p.feed(html)
    seen: set[str] = set()
    emails: list[str] = []
    for href in p.hrefs:
        value = href[len("mailto:"):]
        # strip ?subject=... query part like mail clients do? The reference
        # passes the raw value to Parse, which rejects '?' in domain — keep raw.
        email = parse_email(value)
        if email and email not in seen:
            emails.append(email)
            seen.add(email)
    return emails


def regex_email_extractor(body: bytes | str) -> list[str]:
    """gmaps/emailjob.go:125-139 — regex scan, first-wins dedup."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    seen: set[str] = set()
    emails: list[str] = []
    for m in _EMAIL_RE.finditer(body):
        e = m.group(0)
        if e not in seen:
            emails.append(e)
            seen.add(e)
    return emails


def extract_emails(html: str | bytes) -> list[str]:
    """Full email-hop semantics (gmaps/emailjob.go:90-93): DOM pass first,
    regex fallback only when the DOM pass yields nothing."""
    emails = doc_email_extractor(html)
    if not emails:
        emails = regex_email_extractor(html)
    return emails
