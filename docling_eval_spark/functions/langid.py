"""From-scratch hashed char-n-gram language identifier (fastText shape).

Public algorithm only: Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification" — a linear (softmax) classifier over hashed
character-n-gram bag-of-features. CCNet (Wenzek et al. 2020, §4.3) runs
exactly this model family over Common Crawl to bucket pages by language
before per-language perplexity filtering; the reference pipeline has no
language stage at all (docling-eval evaluates prepared datasets), so
this is a beyond-reference component of the LLM-curation tier.

No pretrained weights ship with the repo: the model trains
DETERMINISTICALLY at first use on a seeded synthetic corpus drawn from
per-language function-word lists (public linguistic facts — the ~25
highest-frequency words of each language). Training is 800
full-batch gradient steps over a [5.5k x 4096] matrix — ~15 s in
numpy — and runs ONCE per driver process (cached); executors receive the final
weight matrix (~400 KB) inside the UDF closure, never the training
loop. Everything is seeded, so weights — and therefore predictions —
are bit-reproducible across sessions, which is what lets the oracle
gate assert exact per-row agreement.

Scale shape: scoring is one Arrow-batched stage (SCALAR_ITER pandas
UDF), no shuffle, no per-row Python rows — the same cost profile as the
minhash signature stage.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np

# ~25 highest-frequency function words per language (public facts).
# 23 languages; deliberately includes the classic confusable pairs
# (sv/da/no, es/pt/ca, id) so the classifier earns its keep.
LANG_WORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it",
           "he", "was", "for", "on", "are", "as", "with", "they", "at",
           "be", "this", "have", "from", "not", "what", "all"),
    "de": ("der", "die", "und", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht",
           "ein", "eine", "als", "auch", "werden", "aus", "hat",
           "dass", "nach"),
    "fr": ("le", "de", "un", "être", "et", "il", "avoir", "ne", "je",
           "son", "que", "se", "qui", "ce", "dans", "en", "du", "elle",
           "au", "pour", "pas", "vous", "par", "sur", "faire"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no",
           "haber", "por", "con", "su", "para", "como", "estar",
           "tener", "le", "lo", "todo", "pero", "más", "hacer",
           "poder"),
    "pt": ("o", "de", "que", "e", "do", "da", "em", "um", "para", "é",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais",
           "as", "dos", "como", "mas", "foi", "ao"),
    "it": ("il", "di", "che", "e", "la", "un", "è", "per", "in",
           "una", "mi", "sono", "ho", "non", "lo", "ha", "le", "si",
           "ti", "con", "cosa", "io", "questo", "qui", "del"),
    "nl": ("de", "het", "een", "en", "van", "ik", "te", "dat", "die",
           "in", "je", "niet", "zijn", "is", "was", "op", "aan", "met",
           "als", "voor", "er", "maar", "om", "hem", "dan"),
    "sv": ("och", "det", "att", "i", "en", "jag", "hon", "som", "han",
           "på", "den", "med", "var", "sig", "för", "så", "till",
           "är", "men", "ett", "om", "hade", "av", "icke", "mig"),
    "da": ("og", "i", "jeg", "det", "at", "en", "den", "til", "er",
           "som", "på", "de", "med", "han", "af", "for", "ikke",
           "der", "var", "mig", "sig", "men", "et", "har", "havde"),
    "no": ("og", "i", "jeg", "det", "at", "en", "et", "den", "til",
           "er", "som", "på", "de", "med", "han", "av", "ikke",
           "der", "så", "var", "meg", "seg", "men", "har", "mitt"),
    "fi": ("ja", "on", "se", "että", "ei", "hän", "oli", "mutta",
           "niin", "kuin", "kun", "minä", "sen", "nyt", "mitä",
           "tämä", "jos", "hänen", "olen", "voi", "sitten", "mukaan",
           "myös", "vain", "jo"),
    "pl": ("w", "i", "się", "na", "nie", "to", "z", "że", "do", "o",
           "jak", "po", "co", "tak", "jest", "za", "ale", "jego",
           "ja", "czy", "tym", "mnie", "być", "może", "przez"),
    "cs": ("a", "se", "v", "na", "je", "že", "o", "s", "z", "do",
           "ale", "po", "co", "tak", "jak", "za", "k", "i", "už",
           "být", "jsem", "si", "ve", "pro", "mi"),
    "ro": ("de", "a", "în", "și", "la", "cu", "pe", "un", "o", "că",
           "nu", "este", "din", "mai", "pentru", "sa", "au", "fost",
           "ca", "sunt", "dar", "prin", "dacă", "ei", "lui"),
    "hu": ("a", "az", "és", "hogy", "nem", "is", "egy", "ez", "van",
           "de", "volt", "ha", "már", "csak", "meg", "mi", "azt",
           "el", "én", "vagy", "ki", "mint", "még", "amikor", "úgy"),
    "tr": ("bir", "bu", "ne", "ve", "o", "için", "çok", "ama", "ben",
           "de", "mi", "daha", "gibi", "var", "olan", "sonra",
           "kadar", "onun", "ile", "en", "her", "şey", "ya", "sen",
           "biz"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
           "ini", "dari", "dalam", "akan", "pada", "juga", "saya",
           "ke", "karena", "ada", "mereka", "sudah", "bisa", "kita",
           "kami", "atau", "anda", "tapi"),
    "vi": ("của", "và", "là", "có", "không", "được", "một",
           "người", "trong", "cho", "tôi", "những", "với",
           "anh", "này", "em", "đã", "về", "như", "thì",
           "đến", "khi", "cũng", "ra", "nhưng"),
    "sw": ("na", "ya", "wa", "kwa", "ni", "za", "katika", "hii",
           "ili", "la", "kama", "kuwa", "hata", "au", "yake", "wake",
           "sana", "pia", "sasa", "tu", "hapo", "yangu", "wao",
           "kila", "lakini"),
    "tl": ("ang", "ng", "sa", "na", "at", "ay", "mga", "ko", "ito",
           "hindi", "ako", "para", "niya", "siya", "kung", "may",
           "mo", "ka", "naman", "lang", "po", "tayo", "siyang",
           "kanyang", "doon"),
    "ca": ("de", "la", "el", "i", "a", "les", "que", "en", "un",
           "per", "amb", "una", "dels", "no", "més", "al", "es",
           "com", "els", "seva", "ha", "aquest", "també", "són",
           "entre"),
    "et": ("ja", "on", "ei", "ta", "see", "oli", "ma", "kui", "aga",
           "oma", "siis", "mis", "ka", "tema", "nii", "või", "veel",
           "nagu", "seda", "kes", "üle", "olid", "välja", "kus",
           "mida"),
    "hr": ("je", "i", "u", "se", "na", "da", "za", "su", "s", "od",
           "a", "o", "kao", "iz", "ali", "po", "ili", "bio", "što",
           "će", "biti", "samo", "njegov", "kada", "vrlo"),
}

LANGS: tuple[str, ...] = tuple(sorted(LANG_WORDS))
N_BUCKETS = 4096        # hashed feature dimension
NGRAM_RANGE = (2, 4)    # char n-grams over "<word>"-padded tokens


def _grams(text: str):
    """Hashed char-n-gram ids of a text (fastText-style word padding)."""
    for w in text.lower().split():
        padded = f"<{w}>"
        for n in range(NGRAM_RANGE[0], NGRAM_RANGE[1] + 1):
            for i in range(max(len(padded) - n + 1, 1)):
                yield crc32(padded[i:i + n].encode("utf-8")) % N_BUCKETS


def featurize(texts) -> np.ndarray:
    """[B, N_BUCKETS] float32 of L1-normalized hashed n-gram counts."""
    X = np.zeros((len(texts), N_BUCKETS), dtype=np.float32)
    for r, t in enumerate(texts):
        for g in _grams(t or ""):
            X[r, g] += 1.0
    norms = X.sum(axis=1, keepdims=True)
    np.divide(X, norms, out=X, where=norms > 0)
    return X


def synth_page(lang: str, seed: int, n_words: int = 40) -> str:
    """Deterministic synthetic page in `lang`: seeded i.i.d. draws from
    the language's function-word list. Used for training (one seed
    family), the oracle fixture (another), and held-out accuracy tests
    (a third) — disjoint seeds, same public distribution."""
    words = LANG_WORDS[lang]
    rng = np.random.RandomState((crc32(lang.encode()) + seed) % (2**31))
    return " ".join(words[i] for i in rng.randint(0, len(words), n_words))


def train_langid(seed: int = 7, samples_per_lang: int = 240,
                 n_words: int = 30, iters: int = 800,
                 lr: float = 500.0) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic softmax regression on the synthetic corpus.

    Returns (W [L, D] float32, b [L] float32). Full-batch gradient
    descent — the dataset is ~2.8k x 4096, so there is nothing to
    distribute; determinism (fixed seed, fixed iteration count, float32
    accumulation in a fixed order) is the property the oracle relies
    on.
    """
    texts, labels = [], []
    for li, lang in enumerate(LANGS):
        for s in range(samples_per_lang):
            texts.append(synth_page(lang, seed * 1_000_003 + s, n_words))
            labels.append(li)
    X = featurize(texts)
    y = np.asarray(labels)
    L, D = len(LANGS), N_BUCKETS
    W = np.zeros((L, D), dtype=np.float32)
    b = np.zeros(L, dtype=np.float32)
    Y = np.zeros((len(y), L), dtype=np.float32)
    Y[np.arange(len(y)), y] = 1.0
    n = float(len(y))
    for _ in range(iters):
        Z = X @ W.T + b                       # [N, L]
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = (P - Y) / n                       # [N, L]
        W -= lr * (G.T @ X)
        b -= lr * G.sum(axis=0)
    return W, b


_MODEL: tuple[np.ndarray, np.ndarray] | None = None


def get_model() -> tuple[np.ndarray, np.ndarray]:
    """Train-once process-level cache (driver side)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = train_langid()
    return _MODEL


def predict(texts, W: np.ndarray, b: np.ndarray):
    """(langs list[str], confidence np.ndarray) for a batch of texts.

    Empty/whitespace-only text predicts 'und' with confidence 0 —
    a zero feature vector would otherwise argmax into whatever language
    the bias favors.
    """
    X = featurize(texts)
    Z = X @ W.T + b
    Z -= Z.max(axis=1, keepdims=True)
    P = np.exp(Z)
    P /= P.sum(axis=1, keepdims=True)
    idx = P.argmax(axis=1)
    conf = P[np.arange(len(texts)), idx]
    empty = X.sum(axis=1) == 0
    langs = ["und" if e else LANGS[i] for i, e in zip(idx, empty)]
    conf = np.where(empty, 0.0, conf)
    return langs, conf
