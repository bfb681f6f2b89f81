"""I/O in the exact reference file formats.

  * edge lists  — ``src SEP dst [SEP weight]`` text (networkx/Java loaders)
  * ``.sim.txt`` — per-source top-k similarity lines ``v,n:score,...``
                   (``utils/Print.java:25-84``; older runs used space SEP)
  * ``.emb``     — word2vec text format (``node2vec/src/main.py:98``)
  * ``.mat``     — BlogCatalog MAT file with ``network``/``group``
                   (``node2vec/src/classify.py:184-192``)
"""

from graphtpu.io.edgelist import read_edgelist, write_edgelist
from graphtpu.io.simfile import read_sim_file, write_sim_file, write_topk_files
from graphtpu.io.embfile import read_emb, write_emb
from graphtpu.io.matfile import load_blogcatalog

__all__ = [
    "read_edgelist",
    "write_edgelist",
    "read_sim_file",
    "write_sim_file",
    "write_topk_files",
    "read_emb",
    "write_emb",
    "load_blogcatalog",
]
