"""Deterministic test corpora (FIXTURES.md §2-§5).

- REFERENCE_DOCS: the 10-doc golden corpus from the reference's own tests
  (ReferenceMatchingTests.cs:22-34).
- movies(): synthetic stand-in for the reference's 40k-movie corpus
  (the real movies.csv is an absent git-LFS blob): includes "The
  Shawshank Redemption", several other Redemption titles, and typo-
  neighborhood distractors, per MovieSearchParityTests.cs:13-25.
- REFERENCE_QUERIES: the reference query set (QueryBenchmarks.cs:134-186
  + parity tests).
"""

from __future__ import annotations

REFERENCE_DOCS: list[tuple[int, str]] = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "A journey of a thousand miles begins with a single step"),
    (3, "To be or not to be, that is the question"),
    (4, "All that glitters is not gold"),
    (5, "The fox was quick and clever in the forest"),
    (6, "Batman and Robin fight crime in Gotham City"),
    (7, "Superman flies faster than a speeding bullet"),
    (8, "Spider-Man swings through New York City"),
    (9, "Wonder Woman protects the innocent"),
    (10, "The Flash runs at incredible speeds"),
]

# (name, query, k)
REFERENCE_QUERIES: list[tuple[str, str, int]] = [
    ("short_f", "f", 10),
    ("short_fo", "fo", 10),
    ("short_ba", "ba", 10),
    ("mixed_two_fo", "to be", 10),  # all-short words -> short path on 'to be'
    ("mixed_quick_a", "a quick", 10),  # mixed: stage 1 strips 'a'
    ("batman", "batman", 10),
    ("qick_fux", "qick fux", 10),
    ("battamam", "battamam", 10),
    ("quick_fox", "quick fox", 10),
    ("gotham_city", "gotham city", 10),
    ("the", "the", 10),
    ("speeding_bullet", "speeding bullet", 10),
    ("wonder_woman", "wonder woman protects", 10),
]

MOVIE_QUERIES: list[tuple[str, str, int]] = [
    ("shawshank", "Shawshank", 10),
    ("shaaawshank", "Shaaawshank", 10),
    ("shaa_awashank", "Shaa awashank", 10),
    ("redemption_shank", "redemption shank", 10),
    ("redemption_sh", "redemption sh", 10),
    ("dark_knight", "dark knight", 10),
    ("goodfelas_typo", "goodfelas", 10),
]

# Czech school names with heavy diacritics (schools.json shape from the
# reference test suite) — exercises the full fold table end to end.
SCHOOL_DOCS: list[tuple[int, str]] = [
    (1, "1. mateřská škola Březnice"),
    (2, "Základní škola a Mateřská škola Žďár nad Sázavou"),
    (3, "Gymnázium Jana Keplera Praha"),
    (4, "Střední průmyslová škola elektrotechnická Plzeň"),
    (5, "Vyšší odborná škola uměleckoprůmyslová Říčany"),
    (6, "Konzervatoř Pardubice"),
    (7, "Základní umělecká škola Český Krumlov"),
    (8, "Mateřská škola Čtyřlístek Třebíč"),
    (9, "Obchodní akademie Náchod"),
    (10, "Jazyková škola s právem státní jazykové zkoušky Brno"),
]

SCHOOL_QUERIES: list[tuple[str, str, int]] = [
    ("materska_skola", "materska skola", 10),  # accentless query
    ("breznice", "breznice", 10),
    ("gymnazium_praha", "gymnázium praha", 10),  # accented query
    ("zakladni_umelecka", "zakladni umelecka", 10),
    ("trebic_typo", "trebik", 10),  # fold + LD1 fuzzy
]

_GENRES = ["Drama", "Sci-Fi", "Fantasy", "Horror", "Action", "Comedy"]

_BASE_TITLES = [
    "The Shawshank Redemption",
    "Redemption Road",
    "Redemption Day",
    "Blood Redemption",
    "The Redemption of General Butt Naked",
    "Shanks",
    "Sharkshank",
    "The Shawl",
    "Shane",
    "The Dark Knight",
    "The Godfather",
    "Goodfellas",
    "Pulp Fiction",
    "Fight Club",
    "Forrest Gump",
    "Inception",
    "The Matrix",
    "Seven Samurai",
    "City of God",
    "Spirited Away",
    "Interstellar",
    "Parasite",
    "Whiplash",
    "The Prestige",
    "Memento",
    "Gladiator",
    "The Departed",
    "The Green Mile",
    "Alien",
    "Blade Runner",
]

_WORDS = (
    "story of a man who finds hope in the darkest place and a friendship "
    "that spans decades a tale about crime family loyalty betrayal and "
    "power in the city an epic journey through space and time to save "
    "humanity from extinction"
).split()


def movies(n: int = 240) -> list[dict]:
    """Deterministic movie rows: title, description, genre, year, id.

    The first len(_BASE_TITLES) rows carry the curated titles (parity
    targets + distractors); the rest are templated filler so df/idf
    statistics resemble a real catalogue. No RNG — everything derives
    from the row index.
    """
    rows: list[dict] = []
    for i in range(n):
        if i < len(_BASE_TITLES):
            title = _BASE_TITLES[i]
        else:
            a = _WORDS[i % len(_WORDS)]
            b = _WORDS[(i * 7 + 3) % len(_WORDS)]
            title = f"The {a.capitalize()} {b.capitalize()} {i}"
        desc_words = [_WORDS[(i * 13 + j * 5) % len(_WORDS)] for j in range(12)]
        rows.append(
            {
                "id": i + 1,
                "title": title,
                "description": " ".join(desc_words),
                "genre": _GENRES[i % len(_GENRES)],
                "year": 1950 + (i * 17) % 75,
            }
        )
    return rows


def movie_docs(n: int = 240) -> list[tuple[int, str]]:
    """(doc_key, indexed_text) pairs — title is the searched field."""
    return [(m["id"], m["title"]) for m in movies(n)]
