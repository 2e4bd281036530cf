"""Recorded-style HTML fixtures for the ingest edge tests.

Synthetic markup (not captured from any live site) shaped like a listing
search result: one ``listing-card`` div per property, plus detail pages.
"""

CARD_TMPL = """
<div class="listing-card" data-mls="{mls}">
  <div class="body">
    <span class="price">{price}</span>
    <span class="address">{address}</span>
    <span class="stats">{stats}</span>
    <span class="agent">{agent}</span>
    <span class="agent-phone">{phone}</span>
    <span class="broker">{broker}</span>
  </div>
</div>
"""


def search_page(cards: list[dict]) -> str:
    return "<html><body>" + "".join(CARD_TMPL.format(**c) for c in cards) + "</body></html>"


PAGE1_CARDS = [
    dict(
        mls="100001",
        price="$450,000",
        address="123 Main St, Provo, UT 84601",
        stats="3 bd | 2 ba | 1,800 sqft",
        agent="Ann Smith",
        phone="(801) 555-1234",
        broker="Wasatch Realty",
    ),
    dict(
        mls="100002",
        price="$1,250,000",
        address="456 Oak Ave,  Salt Lake City, UT 84101",
        stats="5 bd | 4 ba | 4,200 sqft",
        agent="Bob Jones Jr",
        phone="8015559876",
        broker="Wasatch Realty",
    ),
    dict(  # lenient-parse row: bad price, no sqft in stats, single-token agent
        mls="100003",
        price="Call for price",
        address="789 Pine Rd, Orem, UT 84057",
        stats="2 bd | 1 ba",
        agent="Cher",
        phone="not-a-phone",
        broker="",
    ),
]

DETAIL_TMPL = """
<html><body>
  <span class="days-on">Days on URE {days}</span>
  <span class="prop-type">Type {typ}</span>
  <span class="prop-style">Style {style}</span>
</body></html>
"""

DETAILS = {
    "100001": DETAIL_TMPL.format(days=12, typ="Condo", style="Rambler"),
    "100002": DETAIL_TMPL.format(days=90, typ="Single Family", style="2-Story"),
    "100003": DETAIL_TMPL.format(days=5, typ="Townhome", style="Split"),
}


def fake_fetcher_factory():
    """Deterministic fetcher: page 1 of zip 84601 has the three cards,
    every other page is empty; detail URLs serve DETAILS."""

    def fetch(url: str) -> str:
        for mls, html in DETAILS.items():
            if url.endswith("/" + mls):
                return html
        if "page/1?" in url or url.endswith("/1"):
            return search_page(PAGE1_CARDS)
        return "<html><body>no results</body></html>"

    return fetch
