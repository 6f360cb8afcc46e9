"""The in-engine SPARQL surface in one script (round-4 close): the
full pattern algebra — BGP joins, FILTER, VALUES, OPTIONAL, MINUS —
plus CONSTRUCT deriving new KG edges and a GROUP BY composition, all
over a Ray Data triple set (the reference reaches this only through a
remote endpoint; here it is a distributed plan of bucket hash-joins).

Run: PYTHONPATH=.. python sparql.py
"""

import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")

import pandas as pd                                               # noqa: E402

import ray.data                                                   # noqa: E402
from pyrdf2vec_ray.ops.bgp import bgp_construct, bgp_match        # noqa: E402
from pyrdf2vec_ray.shuffle import bucket_count                    # noqa: E402

TRIPLES = [
    ("ada", "knows", "grace"), ("grace", "knows", "ada"),
    ("ada", "works_at", "lab1"), ("grace", "works_at", "lab1"),
    ("alan", "works_at", "lab2"), ("alan", "knows", "ada"),
    ("lab1", "in_city", "london"), ("lab2", "in_city", "manchester"),
]
s, p, o = zip(*TRIPLES)
kg = ray.data.from_pandas(pd.DataFrame(
    {"subj": s, "pred": p, "obj": o}))

print("== colleagues who know each other (cycle join) ==")
print(bgp_match(kg, [("?a", "works_at", "?l"),
                     ("?b", "works_at", "?l"),
                     ("?a", "knows", "?b")]).to_pandas())

print("== OPTIONAL: everyone's lab, who they know if anyone ==")
print(bgp_match(kg, [("?a", "works_at", "?l")],
                optional=[[("?a", "knows", "?b")]]).to_pandas())

print("== MINUS + VALUES: labs of selected people with no London tie ==")
print(bgp_match(kg, [("?a", "works_at", "?l")],
                values={"a": ["ada", "alan"]},
                minus=[[("?l", "in_city", "london")]]).to_pandas())

print("== CONSTRUCT: derive colleague edges ==")
print(bgp_construct(kg, [("?a", "works_at", "?l"),
                         ("?b", "works_at", "?l")],
                    template=("?a", "colleague_of", "?b"),
                    filters=[("a", "!=", "?b")]).to_pandas())

print("== GROUP BY composition: headcount per city ==")
sols = bgp_match(kg, [("?a", "works_at", "?l"),
                      ("?l", "in_city", "?city")])
print(bucket_count(sols.select_columns(["city"]), ["city"],
                   count_col="n_people").to_pandas())

print("== the same engine from SPARQL text ==")
from pyrdf2vec_ray.ops.sparql import sparql_query               # noqa: E402
print(sparql_query(kg, '''
    SELECT ?a ?city WHERE {
      ?a works_at ?l .
      ?l in_city ?city .
      FILTER(?a != grace)
    }
''').to_pandas())

print("== round-5 text-surface additions ==")
# sequence + inverse property paths (parse-time expansion)
print(sparql_query(kg, '''
    SELECT ?a ?city WHERE { ?a works_at/in_city ?city . }
''').to_pandas())
print(sparql_query(kg, '''
    SELECT ?who WHERE { lab1 ^works_at ?who . }
''').to_pandas())
# aggregates with COUNT(DISTINCT), HAVING, and an ordered slice
print(sparql_query(kg, '''
    SELECT ?l (COUNT(?a) AS ?n) (COUNT(DISTINCT ?a) AS ?nd)
    WHERE { ?a works_at ?l . } GROUP BY ?l HAVING(?n >= 2)
''').to_pandas())
print(sparql_query(kg, '''
    SELECT ?a ?b WHERE {
      { ?a knows ?b . } UNION { ?b knows ?a . }
      BIND("social" AS ?kind)
    } ORDER BY ?a ?b LIMIT 3 OFFSET 1
''').to_pandas())

ray.shutdown()
