import pyarrow as pa
import pytest

from geoflow.pipelines.flagship import enrich_pages, run_flagship
from geoflow.sources.pages import pages_dataset


def test_strict_mode_fails_on_tampered_text(ray_session):
    import ray.data as rd

    def _tamper(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        texts[0] = (texts[0] or "") + " TAMPERED"
        i = b.column_names.index("text")
        return b.set_column(i, "text", pa.array(texts, pa.string()))

    tampered = pages_dataset(50, override_num_blocks=1).map_batches(
        _tamper, batch_format="pyarrow")
    with pytest.raises(Exception, match="byte-identity"):
        enrich_pages(tampered, strict=True).count()


def test_strict_mode_passes_on_clean_input(ray_session):
    out = run_flagship(pages_dataset(200, override_num_blocks=2)).to_pandas()
    assert len(out) > 0
