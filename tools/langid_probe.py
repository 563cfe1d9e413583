"""Language-ID accuracy probe (r3 verdict item 4 "Done" evidence).

Held-out multilingual fixture — sentences written for this repo,
deliberately DISJOINT from the training corpus embedded in
text/langid.py — scored by BOTH classifiers through their real Spark
projections:

  * trigram profiles  (add_language_id_ngram — the new default)
  * stopword voting   (add_language_id_stopword — the r1-r3 toy)

Reports per-language and overall accuracy for each, plus the
'unknown' behavior on out-of-alphabet text, and appends the table to
BENCH/LANGID.md. Deterministic: fixed fixture, no sampling.

Usage: python tools/langid_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Held-out probe sentences. General register, function-word heavy like
# real web text; NONE appear in langid._SEED_TEXTS. The last group is
# short/hard: 3-6 word fragments where stopword voting has almost no
# signal but trigram statistics still do.
FIXTURE = {
    "en": [
        "The museum opens early on weekends and entry is free for students.",
        "Nobody knew exactly when the bridge had been built or by whom.",
        "She poured the coffee slowly while reading yesterday's newspaper.",
        "The committee will publish its findings at the start of next month.",
        "A cold wind came down from the hills just before sunset.",
        "He fixed the broken shelf with two screws and a bit of glue.",
        "Their flight was delayed, so they spent the night near the airport.",
        "Every spring the garden fills with tulips and white daffodils.",
        "learning new things takes time",
        "a quiet place to read",
    ],
    "de": [
        "Das Museum öffnet am Wochenende früh und der Eintritt ist für Studenten frei.",
        "Niemand wusste genau, wann die Brücke gebaut worden war oder von wem.",
        "Sie goss den Kaffee langsam ein und las dabei die Zeitung von gestern.",
        "Der Ausschuss wird seine Ergebnisse Anfang nächsten Monats veröffentlichen.",
        "Kurz vor Sonnenuntergang kam ein kalter Wind von den Hügeln herab.",
        "Er reparierte das kaputte Regal mit zwei Schrauben und etwas Leim.",
        "Ihr Flug hatte Verspätung, deshalb übernachteten sie in der Nähe des Flughafens.",
        "Jedes Frühjahr füllt sich der Garten mit Tulpen und weißen Narzissen.",
        "neue Dinge zu lernen braucht Zeit",
        "ein ruhiger Ort zum Lesen",
    ],
    "fr": [
        "Le musée ouvre tôt le week-end et l'entrée est gratuite pour les étudiants.",
        "Personne ne savait exactement quand le pont avait été construit ni par qui.",
        "Elle versait le café lentement en lisant le journal de la veille.",
        "Le comité publiera ses conclusions au début du mois prochain.",
        "Un vent froid descendait des collines juste avant le coucher du soleil.",
        "Il a réparé l'étagère cassée avec deux vis et un peu de colle.",
        "Leur vol était retardé, alors ils ont passé la nuit près de l'aéroport.",
        "Chaque printemps le jardin se remplit de tulipes et de jonquilles blanches.",
        "apprendre de nouvelles choses prend du temps",
        "un endroit calme pour lire",
    ],
    "es": [
        "El museo abre temprano los fines de semana y la entrada es gratuita para estudiantes.",
        "Nadie sabía exactamente cuándo se había construido el puente ni quién lo hizo.",
        "Ella servía el café despacio mientras leía el periódico de ayer.",
        "El comité publicará sus conclusiones a principios del próximo mes.",
        "Un viento frío bajaba de las colinas justo antes del atardecer.",
        "Arregló la estantería rota con dos tornillos y un poco de pegamento.",
        "Su vuelo se retrasó, así que pasaron la noche cerca del aeropuerto.",
        "Cada primavera el jardín se llena de tulipanes y narcisos blancos.",
        "aprender cosas nuevas lleva tiempo",
        "un lugar tranquilo para leer",
    ],
    "zh": [
        "博物馆周末开得很早，学生可以免费入场。",
        "没有人确切知道这座桥是什么时候建的，也不知道是谁建的。",
        "她一边慢慢倒咖啡，一边看昨天的报纸。",
        "委员会将在下个月初公布调查结果。",
        "日落前一阵冷风从山上吹了下来。",
        "他用两颗螺丝和一点胶水修好了坏掉的架子。",
        "他们的航班延误了，所以在机场附近过了一夜。",
        "每年春天花园里开满了郁金香和白色的水仙花。",
        "学习新东西需要时间",
        "一个安静的读书地方",
    ],
    "it": [
        "Il museo apre presto nel fine settimana e l'ingresso è gratuito per gli studenti.",
        "Nessuno sapeva esattamente quando il ponte fosse stato costruito né da chi.",
        "Versava il caffè lentamente mentre leggeva il giornale di ieri.",
        "Il comitato pubblicherà le sue conclusioni all'inizio del mese prossimo.",
        "Un vento freddo scendeva dalle colline poco prima del tramonto.",
        "Ha riparato lo scaffale rotto con due viti e un po' di colla.",
        "Il loro volo era in ritardo, così hanno passato la notte vicino all'aeroporto.",
        "Ogni primavera il giardino si riempie di tulipani e narcisi bianchi.",
        "imparare cose nuove richiede tempo",
        "un posto tranquillo per leggere",
    ],
    "pt": [
        "O museu abre cedo aos fins de semana e a entrada é gratuita para estudantes.",
        "Ninguém sabia exatamente quando a ponte tinha sido construída nem por quem.",
        "Ela servia o café devagar enquanto lia o jornal de ontem.",
        "O comité vai publicar as suas conclusões no início do próximo mês.",
        "Um vento frio descia das colinas pouco antes do pôr do sol.",
        "Ele arranjou a prateleira partida com dois parafusos e um pouco de cola.",
        "O voo deles atrasou, por isso passaram a noite perto do aeroporto.",
        "Cada primavera o jardim enche-se de tulipas e narcisos brancos.",
        "aprender coisas novas leva tempo",
        "um lugar sossegado para ler",
    ],
}
# Out-of-alphabet control: must come back 'unknown' from the trigram
# model (no vocabulary trigram fires). Cyrillic/Greek scripts are in no
# profile (zh IS a profile language since round 4's widening).
UNKNOWN_TEXTS = ["привет мир это русский текст", "καλημέρα κόσμε", "42 17 99 -- !!", ""]


def run(spark):
    from featurewiz_spark.text.langid import add_language_id_ngram
    from featurewiz_spark.text.stats import add_language_id_stopword

    rows, i = [], 0
    for lang, sents in FIXTURE.items():
        for s in sents:
            rows.append((i, lang, s))
            i += 1
    for s in UNKNOWN_TEXTS:
        rows.append((i, "unknown", s))
        i += 1
    df = spark.createDataFrame(rows, "doc_id long, truth string, text string")
    ng = {r["doc_id"]: r["lang_pred"]
          for r in add_language_id_ngram(df, "text", "lang_pred").collect()}
    sw = {r["doc_id"]: r["lang_pred"]
          for r in add_language_id_stopword(df, "text", "lang_pred").collect()}
    truth = {r[0]: r[1] for r in rows}

    def acc(pred, langs):
        ids = [d for d, t in truth.items() if t in langs]
        hit = sum(pred[d] == truth[d] for d in ids)
        return hit, len(ids)

    table = []
    for lang in list(FIXTURE) + ["unknown"]:
        h_ng, n = acc(ng, {lang})
        h_sw, _ = acc(sw, {lang})
        table.append((lang, n, h_ng, h_sw))
    h_ng, n = acc(ng, set(FIXTURE))
    h_sw, _ = acc(sw, set(FIXTURE))
    table.append((f"ALL ({len(FIXTURE)} langs)", n, h_ng, h_sw))
    misses = [(d, truth[d], ng[d]) for d in truth if ng[d] != truth[d]]
    return table, misses


def main():
    from featurewiz_spark.session import get_spark

    spark = get_spark(app_name="langid_probe", cores=8, shuffle_partitions=8)
    table, misses = run(spark)
    lines = [
        "",
        "## Language-ID accuracy probe (round 4)",
        "",
        "Held-out fixture (tools/langid_probe.py — disjoint from the",
        "training corpus), both classifiers run through their real Spark",
        "projections:",
        "",
        "| truth | n | trigram correct | stopword correct |",
        "|---|---|---|---|",
    ]
    for lang, n, h_ng, h_sw in table:
        lines.append(f"| {lang} | {n} | {h_ng} | {h_sw} |")
    lines.append("")
    if misses:
        lines.append("Trigram misses: " +
                     "; ".join(f"doc{d} {t}→{p}" for d, t, p in misses))
    else:
        lines.append("Trigram misses: none.")
    out = "\n".join(lines) + "\n"
    print(out)
    # Overwrite (idempotent): repeated runs must not stack sections.
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "LANGID.md")
    note = (
        "## Throughput note (why the default is a pandas UDF)\n\n"
        "Spark's higher-order functions (`transform`/`aggregate`) are\n"
        "CodegenFallback — always interpreted, never inside whole-stage\n"
        "codegen — and are excluded from subexpression elimination. The\n"
        "first expression-path cut re-evaluated the normalization regex\n"
        "per trigram and the whole probe chain once per language:\n"
        "~24 ms/row (q62 at sf0.1: 134 s). Staging each step in its own\n"
        "multi-referenced projection fixed the re-evaluation (~50x), but\n"
        "the interpreted-HOF floor remained ~0.7 ms/row. The\n"
        "Arrow-batched kernel (C-speed dict probe per trigram) is ~4x\n"
        "faster still — 0.9 s vs 3.6 s for 5k docs x ~300 chars at\n"
        "local[8] — and restores q62 to 1.55 s (r3: 1.74 s).\n"
        "`impl=\"expr\"` keeps the pure-JVM path for Python-less\n"
        "executors and as the cross-check\n"
        "(pytest `test_langid_pandas_and_expr_impls_agree`).\n"
    )
    with open(bench, "w") as f:
        f.write("# Language-ID probe\n\n" + out + "\n" + note)
    spark.stop()


if __name__ == "__main__":
    main()
