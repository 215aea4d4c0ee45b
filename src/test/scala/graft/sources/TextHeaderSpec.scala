package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Header extraction must read file HEADS only, in file-name order, across
  * plain files, directories of parts, and bgzf-compressed files. */
class TextHeaderSpec extends SparkSpec {

  test("single file: contiguous prefix only") {
    val p = Paths.get(tmpDir(), "a.sam")
    Files.writeString(p, "@HD\tVN:1.6\n@SQ\tSN:chr1\nrec1\n@NOTAHEADER\n")
    val h = TextHeader.headerLines(spark, p.toString, "@")
    // stops at the first non-header line: the later @-line is data
    assert(h == Seq("@HD\tVN:1.6", "@SQ\tSN:chr1"))
  }

  test("directory of parts: concatenated in name order, hidden files skipped") {
    val dir = tmpDir()
    Files.writeString(Paths.get(dir, "part-00001"), "@B\nrec\n")
    Files.writeString(Paths.get(dir, "part-00000"), "@A\nrec\n")
    Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    Files.writeString(Paths.get(dir, ".hidden"), "@X\n")
    assert(TextHeader.headerLines(spark, dir, "@") == Seq("@A", "@B"))
  }

  test("bgzf-compressed file decompresses streaming") {
    val dir = tmpDir()
    val vcf = "##fileformat=VCFv4.2\n#CHROM\tPOS\nchr1\t100\n"
    val gz = Paths.get(dir, "t.vcf.gz")
    val buf = new java.io.ByteArrayOutputStream()
    val bgzf = new Bgzf.BgzfOutputStream(buf)
    bgzf.write(vcf.getBytes("UTF-8"))
    bgzf.close()
    Files.write(gz, buf.toByteArray)
    val h = TextHeader.headerLines(spark, gz.toString, "#")
    assert(h == Seq("##fileformat=VCFv4.2", "#CHROM\tPOS"))
  }
}
