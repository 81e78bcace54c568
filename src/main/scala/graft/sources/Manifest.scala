package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.io.InputStream
import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * Guidewire CDA manifest: JSON map `tableName -> entry`.
 *
 * Value shape per reference `package.scala:10-19`:
 * `{lastSuccessfulWriteTimestamp: string, totalProcessedRecordsCount: int,
 *   dataFilesPath: string, schemaHistory: map<schemaId -> firstCommitTs>}`.
 */
final case class ManifestEntry(
    lastSuccessfulWriteTimestamp: String,
    totalProcessedRecordsCount: Long,
    dataFilesPath: String,
    schemaHistory: Map[String, String]) {
  /** Normalized (no trailing slash) data path, reference package.scala:16-18. */
  def dataPath: String = dataFilesPath.stripSuffix("/")
  def lastWriteTs: Long = lastSuccessfulWriteTimestamp.toLong
}

object Manifest {
  private val mapper = new ObjectMapper()

  def parse(json: String): Map[String, ManifestEntry] = {
    val root = mapper.readTree(json)
    val it = root.properties().iterator()
    val b = Map.newBuilder[String, ManifestEntry]
    while (it.hasNext) {
      val e = it.next()
      val n = e.getValue
      val shIt = n.get("schemaHistory").properties().iterator()
      val sh = Map.newBuilder[String, String]
      while (shIt.hasNext) { val s = shIt.next(); sh += (s.getKey -> s.getValue.asText) }
      b += (e.getKey -> ManifestEntry(
        lastSuccessfulWriteTimestamp = n.get("lastSuccessfulWriteTimestamp").asText,
        totalProcessedRecordsCount = Option(n.get("totalProcessedRecordsCount")).map(_.asLong).getOrElse(0L),
        dataFilesPath = n.get("dataFilesPath").asText,
        schemaHistory = sh.result()))
    }
    b.result()
  }

  def parse(in: InputStream): Map[String, ManifestEntry] =
    parse(new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))

  /** Read + parse a manifest from any Hadoop-visible URI (KB-scale; driver-side). */
  def read(conf: Configuration, location: String): Map[String, ManifestEntry] = {
    val p = new Path(location)
    val in = p.getFileSystem(conf).open(p)
    try parse(in) finally in.close()
  }
}
