import pyarrow as pa

from pomp_ray.core.api import (
    CsvPipeline,
    Field,
    Item,
    RowCrawler,
)


class PageItem(Item):
    url = Field()
    title = Field()
    n = Field(pa.int64())


def test_item_field_order():
    """Field definition order is the schema/CSV order (pomp's load-bearing
    Item metaclass contract)."""
    assert PageItem.schema.names == ["url", "title", "n"]
    i = PageItem(url="u", title="t", n=3)
    assert i.values() == ["u", "t", 3]
    t = PageItem.table_from([i, PageItem(url="v", title="w", n=4)])
    assert t.num_rows == 2
    assert t.schema == PageItem.schema


def test_csv_pipeline(tmp_path):
    p = tmp_path / "out.csv"
    pipe = CsvPipeline(str(p))
    pipe.start(None)
    pipe.process_batch(None, PageItem.table_from(
        [PageItem(url="u1", title="t1", n=1)]))
    pipe.stop(None)
    assert p.read_bytes() == b"u1,t1,1\r\n"


def test_console_pipeline(capsys):
    """ConsolePipeline (SURVEY.md S7): prints one line per item row and
    passes the batch through unchanged."""
    from pomp_ray.core.api import ConsolePipeline

    pipe = ConsolePipeline()
    pipe.start(None)
    batch = PageItem.table_from([PageItem(url="u1", title="t1", n=1),
                                 PageItem(url="u2", title="t2", n=2)])
    out = pipe.process_batch(None, batch)
    pipe.stop(None)
    assert out is batch
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert "u1" in lines[0] and "t1" in lines[0]
    assert "u2" in lines[1] and "n" in lines[1]


def test_row_crawler_adapter():
    class MyCrawler(RowCrawler):
        ENTRY_REQUESTS = "http://site0.test/p/0"

    spec = MyCrawler().to_spec()
    assert spec.seeds == [{"url": "http://site0.test/p/0", "priority": 0,
                           "depth": 0}]
    title, text, links = spec.parse_fn()(
        b'<html><head><title>T</title></head><body><p>B</p>'
        b'<a href="/p/1">l</a></body></html>')
    assert title == "T"
    assert text == "T\nB"
    assert links == ["/p/1"]
