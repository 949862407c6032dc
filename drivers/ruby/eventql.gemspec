Gem::Specification.new do |s|
  s.name        = "eventql-tpu"
  s.version     = "0.1.0"
  s.summary     = "Ruby client for the eventql_tpu HTTP API"
  s.description = "SQL queries and inserts against an eventql_tpu server"
  s.authors     = ["eventql_tpu"]
  s.files       = Dir["lib/**/*.rb"]
  s.homepage    = "https://localhost/"
  s.license     = "MIT"
end
