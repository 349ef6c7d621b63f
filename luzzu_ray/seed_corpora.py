"""Deterministic seed corpora for the hashed n-gram langid and perplexity
models, and word lists for the synthetic transcript generator.

These short public-domain-style texts are embedded so the models are a pure
function of this repo (no downloads, no external data) — the model "weights"
are built from these at import time, deterministically.  Both the engine and
the oracle consume the same derived weights, exactly as two processes would
load the same fastText ``.bin`` / KenLM ``.arpa`` file.
"""

SEED_TEXT = {
    "en": """
the quick brown fox jumps over the lazy dog while the sun sets behind the
hills and the river runs quietly through the valley of green fields where
children play and old men talk about the weather and the harvest that will
come in the autumn when the leaves turn red and gold and fall to the ground
please let me know if you have any questions about the report i sent you
yesterday because we need to finish the project before the end of the month
and the team is waiting for your feedback on the design document
i think that is a great idea and we should definitely try it out next week
when everyone is back from the holidays and we can schedule a meeting to
discuss the details of the implementation plan and the budget for the year
thank you for your help with the analysis it was very useful and we learned
a lot about the customers and what they want from the product in the future
the model was trained on a large corpus of text and it can answer questions
about many different topics with high accuracy and low latency in production
could you please summarize the main points of the article and explain why
the author believes that the new approach is better than the old one
""",
    "fr": """
le renard brun rapide saute par dessus le chien paresseux pendant que le
soleil se couche derriere les collines et la riviere coule doucement dans la
vallee des champs verts ou les enfants jouent et les vieux hommes parlent du
temps et de la recolte qui viendra en automne quand les feuilles deviennent
rouges et tombent sur le sol
merci beaucoup pour votre aide avec le rapport que je vous ai envoye hier
parce que nous devons terminer le projet avant la fin du mois et toute
equipe attend vos commentaires sur le document de conception
je pense que c'est une tres bonne idee et nous devrions certainement
essayer la semaine prochaine quand tout le monde sera de retour des
vacances et nous pourrons organiser une reunion pour discuter des details
pourriez vous resumer les points principaux de l'article et expliquer
pourquoi l'auteur croit que la nouvelle approche est meilleure que
l'ancienne methode utilisee dans les travaux precedents
le modele a ete entraine sur un grand corpus de textes et il peut repondre
aux questions sur de nombreux sujets differents avec une grande precision
""",
    "de": """
der schnelle braune fuchs springt uber den faulen hund wahrend die sonne
hinter den hugeln untergeht und der fluss leise durch das tal der grunen
felder fliesst wo kinder spielen und alte manner uber das wetter und die
ernte sprechen die im herbst kommen wird wenn die blatter rot und golden
werden und auf den boden fallen
vielen dank fur ihre hilfe mit dem bericht den ich ihnen gestern geschickt
habe weil wir das projekt vor ende des monats abschliessen mussen und das
team auf ihre ruckmeldung zum entwurfsdokument wartet
ich denke das ist eine sehr gute idee und wir sollten es nachste woche
unbedingt ausprobieren wenn alle aus dem urlaub zuruck sind und wir ein
treffen planen konnen um die einzelheiten des plans zu besprechen
konnten sie bitte die wichtigsten punkte des artikels zusammenfassen und
erklaren warum der autor glaubt dass der neue ansatz besser ist als der
alte der in fruheren arbeiten verwendet wurde
das modell wurde auf einem grossen textkorpus trainiert und kann fragen zu
vielen verschiedenen themen mit hoher genauigkeit beantworten
""",
    "es": """
el rapido zorro marron salta sobre el perro perezoso mientras el sol se
pone detras de las colinas y el rio corre tranquilamente por el valle de
los campos verdes donde los ninos juegan y los ancianos hablan del tiempo
y de la cosecha que vendra en otono cuando las hojas se vuelven rojas y
doradas y caen al suelo
muchas gracias por su ayuda con el informe que le envie ayer porque
tenemos que terminar el proyecto antes de fin de mes y todo el equipo
espera sus comentarios sobre el documento de diseno
creo que es una muy buena idea y definitivamente deberiamos probarla la
proxima semana cuando todos vuelvan de las vacaciones y podamos organizar
una reunion para discutir los detalles del plan y el presupuesto del ano
podria usted resumir los puntos principales del articulo y explicar por
que el autor cree que el nuevo enfoque es mejor que el antiguo metodo
utilizado en los trabajos anteriores
el modelo fue entrenado con un gran corpus de textos y puede responder
preguntas sobre muchos temas diferentes con alta precision y baja latencia
""",
}

LANGS = tuple(sorted(SEED_TEXT))


def wordlist(lang: str) -> list[str]:
    """Deterministic per-language vocabulary for the synthetic generator."""
    words = []
    seen = set()
    for w in SEED_TEXT[lang].split():
        if len(w) >= 2 and w not in seen:
            seen.add(w)
            words.append(w)
    return words
