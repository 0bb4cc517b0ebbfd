"""Raw PubMed XML fixtures (FIXTURES.md §9): gzipped baseline + update
files with structured abstracts, VernacularTitle/MedlineDate fallbacks,
page-range shorthand, cross-file duplicate PMIDs (last-wins test) and
DeleteCitation CDC entries."""

from __future__ import annotations

import gzip
import os

_ARTICLE = """
<PubmedArticle>
 <MedlineCitation Status="{status}" IndexingMethod="{indexing}">
  <PMID>{pmid}</PMID>
  <Article>
   {title_elem}
   <Journal>
    <Title>Journal of Fixtures</Title>
    <ISOAbbreviation>J Fix</ISOAbbreviation>
    <JournalIssue><PubDate>{pubdate}</PubDate></JournalIssue>
   </Journal>
   <Abstract>
    <AbstractText Label="BACKGROUND">Background text {pmid}.</AbstractText>
    <AbstractText Label="METHODS">A randomized controlled trial (RCT) registered as {regid}.</AbstractText>
   </Abstract>
   <AuthorList>
    <Author><LastName>Smith</LastName><ForeName>Jo</ForeName><Initials>J</Initials></Author>
    <Author><LastName>Lee</LastName><ForeName>Ann</ForeName><Initials>A</Initials></Author>
   </AuthorList>
   <Pagination><MedlinePgn>{pages}</MedlinePgn></Pagination>
   <PublicationTypeList><PublicationType>Randomized Controlled Trial</PublicationType></PublicationTypeList>
   <DataBankList><DataBank><DataBankName>ClinicalTrials.gov</DataBankName>
    <AccessionNumberList><AccessionNumber>{regid}</AccessionNumber></AccessionNumberList>
   </DataBank></DataBankList>
   <ELocationID EIdType="doi">10.1000/fix.{pmid}</ELocationID>
  </Article>
  <MeshHeadingList>
   <MeshHeading><DescriptorName>Humans</DescriptorName></MeshHeading>
   <MeshHeading><DescriptorName>Stroke</DescriptorName></MeshHeading>
  </MeshHeadingList>
 </MedlineCitation>
</PubmedArticle>"""


def _article(pmid, title="Fixture title %s", vernacular=False, medline_date=False,
             pages="123-9", status="MEDLINE", indexing="Automated", body=None):
    title_elem = (
        f"<VernacularTitle>{(body or title) % pmid}</VernacularTitle>"
        if vernacular
        else f"<ArticleTitle>{(body or title) % pmid}</ArticleTitle>"
    )
    pubdate = (
        "<MedlineDate>1998 Dec-1999 Jan</MedlineDate>"
        if medline_date
        else "<Year>2021</Year>"
    )
    return _ARTICLE.format(
        pmid=pmid,
        title_elem=title_elem,
        pubdate=pubdate,
        pages=pages,
        status=status,
        indexing=indexing,
        regid=f"NCT{int(pmid) % 100000000:08d}",
    )


def _write(path: str, inner: str) -> None:
    xml = f'<?xml version="1.0"?>\n<PubmedArticleSet>{inner}</PubmedArticleSet>'
    with gzip.open(path, "wb") as f:
        f.write(xml.encode())


def generate_xml_fixtures(out_dir: str) -> dict[str, str]:
    """Writes baseline + two update files; returns {name: path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    baseline = "".join(
        [_article(str(p)) for p in range(2001, 2011)]
        + [_article("2011", vernacular=True), _article("2012", medline_date=True)]
    )
    paths["baseline"] = os.path.join(out_dir, "pubmed26n0001.xml.gz")
    _write(paths["baseline"], baseline)

    # update 1: modifies 2001, adds 2101; deletes 2002
    upd1 = "".join(
        [
            _article("2001", body="Updated-once title %s"),
            _article("2101"),
            "<DeleteCitation><PMID>2002</PMID></DeleteCitation>",
        ]
    )
    paths["update1"] = os.path.join(out_dir, "pubmed26n0002.xml.gz")
    _write(paths["update1"], upd1)

    # update 2 (lexically later => wins): modifies 2001 again; deletes and
    # re-inserts 2003 in the same file (delete-then-upsert survival test)
    upd2 = "".join(
        [
            _article("2001", body="Updated-twice title %s"),
            "<DeleteCitation><PMID>2003</PMID></DeleteCitation>",
            _article("2003", body="Reborn title %s"),
        ]
    )
    paths["update2"] = os.path.join(out_dir, "pubmed26n0003.xml.gz")
    _write(paths["update2"], upd2)
    return paths
