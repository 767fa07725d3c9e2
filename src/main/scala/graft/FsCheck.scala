package graft
object FsCheck {
  def main(args: Array[String]): Unit = {
    val spark = Bench.mkSession("4")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).write.mode("overwrite").parquet("/dev/shm/graft_fscheck")
    val files = new java.io.File("/dev/shm/graft_fscheck").listFiles().map(_.getName).sorted
    println("FILES=" + files.mkString(","))
    val fs = new org.apache.hadoop.fs.Path("/dev/shm/graft_fscheck")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    println("FSCLASS=" + fs.getClass.getName)
    spark.stop()
  }
}
