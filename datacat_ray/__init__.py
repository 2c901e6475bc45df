"""datacat-ray: a Ray-Data-native main-content extraction engine.

Built from scratch (not a port) with the data-processing capabilities of the
reference DataCatalogue/grobid-datacat module: Parquet page tables of
Common-Crawl-style web pages are streamed as zero-copy Arrow batches through
``map_batches`` stages — per-url dedup (latest ``warc_ts``), DOM boilerplate
stripping (text-density / link-density), GROBID-style line/token featurization,
a two-stage CRF labeling cascade in warm actor pools, and TEI-XML + flat-text
emission per url.

Reference semantics citations use the convention ``<file>:<lines>`` relative to
``/root/reference/`` (e.g. ``DatacatSegmenterParser.java:794-835``).
"""

__version__ = "0.1.0"
