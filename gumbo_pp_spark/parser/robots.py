"""Robots Exclusion Protocol (RFC 9309) parser + matcher.

A crawl-tier pipeline needs politeness filtering: given each host's
robots.txt and a candidate URL set, which URLs may be fetched /
retained?  This kernel is written from the public spec (RFC 9309 and
the original REP draft):

* group structure: consecutive ``user-agent`` lines open a group that
  the following ``allow`` / ``disallow`` rules join (§2.2.1); groups
  for the same agent merge;
* agent selection: the group whose product token is the LONGEST
  case-insensitive prefix of the client's product token wins; absent
  any match, the ``*`` group applies (§2.2.1);
* rule matching: byte-wise longest-match over the url path —
  the rule with the longest pattern wins; on a length tie ``allow``
  wins (§2.2.2); ``*`` matches any substring, ``$`` anchors the end
  (§2.2.3); an empty pattern participates as length 0;
* no applicable rule / no robots.txt / empty disallow → allowed
  (§2.2.2: "If no matching group exists, crawlers MUST obey the
  implicit allow-all").

Patterns compile to anchored regexes once per distinct robots.txt
(the host table is small next to the corpus; compiled matchers ride a
broadcast, evaluation is Arrow-batched in the Spark stage).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field


def _pattern_to_re(pat: str) -> re.Pattern:
    """REP pattern → anchored regex: '*' = any run, '$' at end = EOL
    anchor, everything else literal.  Prefix-match semantics (the
    pattern matches at the start of the path)."""
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    parts = [re.escape(p) for p in pat.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


@dataclass
class RobotsRules:
    """One agent group's compiled rules."""

    # (pattern_length, allow?, compiled) — length first for the
    # longest-match scan; allow breaks ties (sort key below)
    rules: list[tuple[int, bool, re.Pattern]] = field(default_factory=list)
    # de-facto Crawl-delay extension (RFC 9309 §2.2.4 leaves other
    # records as MAY; crawlers widely honor this one), seconds
    crawl_delay: float | None = None

    def allowed(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for ln, allow, rx in self.rules:
            if ln < best_len or (ln == best_len and not allow):
                continue  # cannot improve (allow wins ties)
            if rx.match(path):
                best_len, best_allow = ln, allow
        return best_allow


@dataclass
class RobotsFile:
    groups: dict[str, RobotsRules] = field(default_factory=dict)
    sitemaps: list[str] = field(default_factory=list)

    def rules_for(self, agent: str) -> RobotsRules:
        """§2.2.1 group selection: longest product-token prefix match,
        else the ``*`` group, else implicit allow-all."""
        agent = agent.lower()
        best: RobotsRules | None = None
        best_len = -1
        for token, rules in self.groups.items():
            if token != "*" and agent.startswith(token) and len(token) > best_len:
                best, best_len = rules, len(token)
        if best is not None:
            return best
        return self.groups.get("*", RobotsRules())

    def allowed(self, agent: str, path: str) -> bool:
        return self.rules_for(agent).allowed(path)

    def crawl_delay(self, agent: str) -> float | None:
        """Crawl-delay of the agent's selected group (de-facto
        extension; None when the group declares none)."""
        return self.rules_for(agent).crawl_delay


def parse_robots(text: str | bytes | None) -> RobotsFile:
    """Parse one robots.txt body (missing/empty → allow-all)."""
    rf = RobotsFile()
    if not text:
        return rf
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", "replace")
    current: list[str] = []  # agent tokens of the OPEN group
    last_was_agent = False
    for raw_line in text.split("\n"):
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            token = val.lower()
            if last_was_agent:
                current.append(token)  # stacked agents share the group
            else:
                current = [token]
            last_was_agent = True
            for t in current:
                rf.groups.setdefault(t, RobotsRules())
            continue
        last_was_agent = False
        if key in ("allow", "disallow"):
            if not current:
                continue  # rule before any user-agent line: ignored
            if key == "disallow" and val == "":
                # "Disallow:" (empty) = allow everything; it still
                # CLOSES the implicit allow — record nothing (length-0
                # disallow would wrongly beat nothing on empty paths)
                continue
            entry = (len(val), key == "allow", _pattern_to_re(val))
            for t in current:
                rf.groups[t].rules.append(entry)
        elif key == "sitemap":
            rf.sitemaps.append(val)
        elif key == "crawl-delay":
            # de-facto extension (spec: other records MAY be supported);
            # malformed values are ignored, later declarations win
            if current:
                try:
                    delay = float(val)
                except ValueError:
                    continue
                # hostile inputs (ADVICE r7): 'inf'/'nan'/'1e308' pass
                # float() but overflow the int ms conversion in
                # crawl_schedule, killing the Arrow task on
                # attacker-controlled web bytes — require finite and
                # clamp to a sane ceiling (11.5 days between fetches)
                if not math.isfinite(delay):
                    continue
                delay = min(delay, 1e6)
                if delay >= 0:
                    for t in current:
                        rf.groups[t].crawl_delay = delay
        # unknown keys: ignored per spec
    return rf


def url_path(url: str) -> str:
    """Path+query of a URL, the REP match subject (scheme/authority
    are matched at the host-join level, not here)."""
    i = url.find("://")
    rest = url[i + 3:] if i >= 0 else url
    j = rest.find("/")
    return rest[j:] if j >= 0 else "/"
